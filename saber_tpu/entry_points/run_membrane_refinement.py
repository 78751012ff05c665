"""`saber analysis refine-membranes`
(reference saber/entry_points/run_membrane_refinement.py:37-134): batch
organelle/membrane refinement over paired runs, fanned over chips."""

from typing import Optional

import click
import numpy as np

from saber_tpu.analysis.refine_membranes import FilteringConfig, OrganelleMembraneFilter
from saber_tpu.parallel.pool import DevicePool
from saber_tpu.utils import zarrlite, zarr_writer


def run_membrane_refinement(organelles: str, membranes: str,
                            output: str = "refined.zarr",
                            ball_size: int = 3,
                            min_membrane_area: int = 10000,
                            keep_surface_membranes: bool = False,
                            num_devices: Optional[int] = None):
    """Refine every run present in both input zarrs."""
    org_root = zarrlite.Group(organelles)
    mem_root = zarrlite.Group(membranes)
    runs = [r for r in org_root.keys() if r in mem_root]
    if not runs:
        raise click.ClickException("no overlapping runs between inputs")

    writer = zarr_writer.get_zarr_writer(output)
    cfg = FilteringConfig(ball_size=ball_size,
                          min_membrane_area=min_membrane_area,
                          keep_surface_membranes=keep_surface_membranes)

    def _load_labels(root, run):
        grp = root[run]
        src = grp["labels"]["0"] if "labels" in grp else grp["0"]
        return np.asarray(src)

    pool = DevicePool(init_fn=lambda i: {"filter": OrganelleMembraneFilter(cfg)},
                      num_devices=num_devices, verbose=True)

    def work(run, device_id, models):
        org = _load_labels(org_root, run)
        mem = _load_labels(mem_root, run)
        out = models["filter"].run(org, mem, batch_processing=True)
        stacked = np.stack([out["organelles"], out["membranes"]])
        writer.write(run, out["organelles"].astype(np.float32), stacked)
        return run

    return pool.execute(work, runs)


@click.command(name="refine-membranes")
@click.option("--organelles", required=True, help="organelle zarr")
@click.option("--membranes", required=True, help="membrane zarr")
@click.option("--output", default="refined.zarr", show_default=True)
@click.option("--ball-size", default=3, show_default=True)
@click.option("--min-membrane-area", default=10000, show_default=True)
@click.option("--keep-surface-membranes", is_flag=True)
@click.option("--num-devices", type=int, default=None)
def refine_membranes(**kwargs):
    """Refine paired organelle/membrane segmentations."""
    run_membrane_refinement(**kwargs)
