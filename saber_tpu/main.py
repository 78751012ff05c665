"""`saber` CLI root (reference saber/main.py:14-32).

Command groups: segment, classifier, analysis, save, gui, web, slurm.
GUI commands are import-guarded like the reference (main.py:8-12) since
Qt is an optional dependency.
"""

import click

from saber_tpu.groups import cli_context


@click.group(context_settings=cli_context)
def routines():
    """SABER-TPU ⚔️ — Segment Anything Based Expert Recognition on TPU."""


@click.group(name="segment")
def segment():
    """Segment tomograms and micrographs."""


from saber_tpu.entry_points.run_tomogram_segment import slab, tomograms  # noqa: E402
from saber_tpu.entry_points.run_micrograph_segment import micrographs  # noqa: E402
from saber_tpu.entry_points.run_fib_segment import fib  # noqa: E402
from saber_tpu.entry_points.run_light_segment import light  # noqa: E402

segment.add_command(slab)
segment.add_command(tomograms)
segment.add_command(micrographs)
segment.add_command(fib)
segment.add_command(light)


@click.group(name="analysis")
def analysis():
    """Post-processing analysis of segmentations."""


from saber_tpu.entry_points.run_analysis import cli as save_group, stats  # noqa: E402
from saber_tpu.entry_points.run_membrane_refinement import refine_membranes  # noqa: E402

analysis.add_command(stats)
analysis.add_command(refine_membranes)

from saber_tpu.classifier.cli import classifier_routines  # noqa: E402

routines.add_command(segment)
routines.add_command(classifier_routines)
routines.add_command(analysis)
routines.add_command(save_group)

try:
    from saber_tpu.gui.run import gui
    routines.add_command(gui)
except Exception:  # Qt optional (reference main.py:8-12)
    pass

from saber_tpu.gui.run import web  # noqa: E402

routines.add_command(web)


@click.group(name="slurm", context_settings=cli_context)
def slurm_routines():
    """Generate SLURM submission scripts."""


from saber_tpu.entry_points.slurm import (micrographs_slurm,  # noqa: E402
                                          refine_membranes_slurm,
                                          tomograms_slurm)

slurm_routines.add_command(tomograms_slurm)
slurm_routines.add_command(micrographs_slurm)
slurm_routines.add_command(refine_membranes_slurm)
routines.add_command(slurm_routines)


@routines.command(name="sam2-weights")
@click.option("--cfg", default="all", show_default=True,
              help="one config name, or 'all'")
def sam2_weights(cfg):
    """Download SAM 2.1 checkpoints into the local cache (reference
    pretrained_weights.py sam2_weights:10-12 / download_sam2_weights)."""
    from saber_tpu.pretrained_weights import (SAM2_CHECKPOINTS,
                                              get_sam2_checkpoint)
    if cfg != "all" and cfg not in SAM2_CHECKPOINTS:
        raise click.BadParameter(
            f"unknown SAM2 config '{cfg}' — choose from "
            f"{', '.join(SAM2_CHECKPOINTS)} or 'all'", param_hint="--cfg")
    names = list(SAM2_CHECKPOINTS) if cfg == "all" else [cfg]
    for name in names:
        _, path = get_sam2_checkpoint(name, download=True)
        click.echo(f"{name}: {path or 'UNAVAILABLE (no network?)'}")


@routines.command(name="sam3-weights")
def sam3_weights():
    """Download the SAM3 checkpoint + CLIP BPE vocab (reference
    pretrained_weights.py sam3_weights:15-18; the HF repo is gated —
    set HF_TOKEN first)."""
    from saber_tpu.pretrained_weights import (get_clip_bpe_path,
                                              get_sam3_checkpoint)
    ckpt = get_sam3_checkpoint(download=True)
    bpe = get_clip_bpe_path(download=True)
    click.echo(f"sam3 checkpoint: {ckpt or 'UNAVAILABLE (gated/no network)'}")
    click.echo(f"clip bpe vocab:  {bpe or 'UNAVAILABLE (no network)'}")


if __name__ == "__main__":
    routines()
