"""SLURM submission verbs (reference saber/entry_points/slurm.py:11-91):
write an sbatch script wrapping the equivalent saber command."""

import click

from saber_tpu.utils.slurm_submit import (create_shellsubmit,
                                          passthrough_command)

# retained name for in-module use; the shared implementation lives in
# utils/slurm_submit so every slurm verb quotes identically
_passthrough_command = passthrough_command


@click.command(name="tomograms")
@click.option("--input", required=True)
@click.option("--output", default="segmentations.zarr", show_default=True)
@click.option("--sam2-cfg", default="small", show_default=True)
@click.option("--model-config", default=None)
@click.option("--model-weights", default=None)
@click.option("--num-chips", default=8, show_default=True)
@click.option("--partition", default="tpu", show_default=True)
@click.option("--walltime", default="18:00:00", show_default=True)
@click.option("--shell-name", default="submit_tomograms.sh", show_default=True)
def tomograms_slurm(input, output, sam2_cfg, model_config, model_weights,
                    num_chips, partition, walltime, shell_name):
    """Generate an sbatch script for batch tomogram segmentation."""
    cmd = _passthrough_command("saber segment tomograms", {
        "input": input, "output": output, "sam2_cfg": sam2_cfg,
        "model_config": model_config, "model_weights": model_weights})
    path = create_shellsubmit("saber-tomo", "saber-tomo-%j.out", shell_name,
                              cmd, partition=partition, num_chips=num_chips,
                              walltime=walltime)
    click.echo(f"wrote {path}; submit with: sbatch {path}")


@click.command(name="micrographs")
@click.option("--input", required=True)
@click.option("--output", default="micrographs.zarr", show_default=True)
@click.option("--sam2-cfg", default="small", show_default=True)
@click.option("--num-chips", default=8, show_default=True)
@click.option("--partition", default="tpu", show_default=True)
@click.option("--walltime", default="18:00:00", show_default=True)
@click.option("--shell-name", default="submit_micrographs.sh", show_default=True)
def micrographs_slurm(input, output, sam2_cfg, num_chips, partition, walltime,
                      shell_name):
    """Generate an sbatch script for batch micrograph segmentation."""
    cmd = _passthrough_command("saber segment micrographs", {
        "input": input, "output": output, "sam2_cfg": sam2_cfg})
    path = create_shellsubmit("saber-micro", "saber-micro-%j.out", shell_name,
                              cmd, partition=partition, num_chips=num_chips,
                              walltime=walltime)
    click.echo(f"wrote {path}; submit with: sbatch {path}")


@click.command(name="refine-membranes")
@click.option("--organelles", required=True, help="organelle zarr")
@click.option("--membranes", required=True, help="membrane zarr")
@click.option("--output", default="refined.zarr", show_default=True)
@click.option("--ball-size", default=3, show_default=True)
@click.option("--min-membrane-area", default=10000, show_default=True)
@click.option("--keep-surface-membranes", is_flag=True)
@click.option("--num-chips", default=8, show_default=True)
@click.option("--partition", default="tpu", show_default=True)
@click.option("--walltime", default="04:00:00", show_default=True)
@click.option("--shell-name", default="submit_refine.sh", show_default=True)
def refine_membranes_slurm(organelles, membranes, output, ball_size,
                           min_membrane_area, keep_surface_membranes,
                           num_chips, partition, walltime, shell_name):
    """Generate an sbatch script for membrane refinement.

    The reference declares this verb but its body is an empty stub
    (reference saber/entry_points/slurm.py:83-89 — `pass`); here it
    writes a working submission like the other slurm verbs (SURVEY §6b
    policy: fix, don't replicate)."""
    cmd = _passthrough_command("saber analysis refine-membranes", {
        "organelles": organelles, "membranes": membranes, "output": output,
        "ball_size": ball_size, "min_membrane_area": min_membrane_area,
        "keep_surface_membranes": keep_surface_membranes})
    path = create_shellsubmit("saber-refine", "saber-refine-%j.out",
                              shell_name, cmd, partition=partition,
                              num_chips=num_chips, walltime=walltime)
    click.echo(f"wrote {path}; submit with: sbatch {path}")
