"""`saber analysis stats` + `saber save` verbs
(reference saber/entry_points/run_analysis.py:35-331)."""

import csv
import os
from typing import Optional

import click
import numpy as np

from saber_tpu.analysis.organelle_statistics import extract_organelle_statistics
from saber_tpu.utils import zarrlite
from saber_tpu.utils.runs import discover_runs


def run_organelle_statistics(input: str, organelle_name: str = "organelle",
                             voxel_size: float = 10.0,
                             session_id: str = "0", user_id: str = "saber",
                             output_csv: str = "organelle_statistics.csv",
                             save_picks: bool = True):
    """Per-run region statistics → CSV (+ pick sidecars)."""
    rows = [["run", "label", "volume_nm3", "diameter_nm"]]
    if os.path.isdir(input) and os.path.exists(os.path.join(input, ".zgroup")):
        root = zarrlite.Group(input)
        for run_name in root.keys():
            grp = root[run_name]
            if "labels" not in grp or "0" not in grp["labels"]:
                continue
            mask = np.asarray(grp["labels"]["0"])
            if mask.ndim == 2:
                mask = mask[None]

            class _R:
                name = run_name
            rows += extract_organelle_statistics(
                _R(), mask, organelle_name, session_id, user_id, voxel_size,
                save_copick=save_picks)
    else:
        for run in discover_runs(input):
            vol, pix = run.get_volume()
            rows += extract_organelle_statistics(
                run, vol.astype(np.uint32), organelle_name, session_id,
                user_id, voxel_size or pix, save_copick=save_picks)

    with open(output_csv, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return output_csv


@click.command(name="stats")
@click.option("--input", required=True, help="segmentation zarr or MRC dir")
@click.option("--organelle-name", default="organelle", show_default=True)
@click.option("--voxel-size", default=10.0, show_default=True)
@click.option("--session-id", default="0", show_default=True)
@click.option("--user-id", default="saber", show_default=True)
@click.option("--output-csv", default="organelle_statistics.csv",
              show_default=True)
def stats(**kwargs):
    """Compute per-organelle volume/diameter statistics."""
    run_organelle_statistics(**kwargs)


@click.group(name="save")
def cli():
    """Export review artifacts (galleries, movies)."""


@cli.command(name="coordinates")
@click.option("--input", required=True, help="segmentation zarr")
@click.option("--organelle-name", default="organelle", show_default=True)
@click.option("--voxel-size", default=10.0, show_default=True)
@click.option("--session-id", default="0", show_default=True)
@click.option("--user-id", default="saber", show_default=True)
def coordinates(input, organelle_name, voxel_size, session_id, user_id):
    """Export per-organelle centroid picks (reference run_analysis.py
    `coordinates`: copick picks; JSON sidecars without copick)."""
    run_organelle_statistics(input, organelle_name, voxel_size, session_id,
                             user_id, output_csv="/dev/null",
                             save_picks=True)
    click.echo("wrote coordinate picks")


@cli.command(name="statistics")
@click.option("--input", required=True, help="segmentation zarr")
@click.option("--organelle-name", default="organelle", show_default=True)
@click.option("--voxel-size", default=10.0, show_default=True)
@click.option("--output-csv", default="organelle_statistics.csv",
              show_default=True)
def statistics(input, organelle_name, voxel_size, output_csv):
    """Export volume/diameter statistics CSV (reference `statistics`)."""
    out = run_organelle_statistics(input, organelle_name, voxel_size,
                                   output_csv=output_csv, save_picks=False)
    click.echo(f"wrote {out}")


@cli.command(name="slurm")
@click.option("--input", required=True)
@click.option("--organelle-name", default="organelle", show_default=True)
@click.option("--shell-name", default="submit_save.sh", show_default=True)
@click.option("--partition", default="tpu", show_default=True)
def save_slurm(input, organelle_name, shell_name, partition):
    """Generate an sbatch script for the statistics export."""
    from saber_tpu.utils.slurm_submit import create_shellsubmit
    cmd = (f"saber save statistics --input {input} "
           f"--organelle-name {organelle_name}")
    path = create_shellsubmit("saber-save", "saber-save-%j.out", shell_name,
                              cmd, partition=partition)
    click.echo(f"wrote {path}")


@cli.command(name="gallery")
@click.option("--input", required=True, help="results zarr")
@click.option("--output", default=None, help="gallery directory")
def gallery(input, output):
    """Paginated PNG gallery from a results zarr."""
    from saber_tpu.visualization.galleries import convert_zarr_to_gallery
    pages = convert_zarr_to_gallery(input, output)
    click.echo(f"wrote {len(pages)} gallery pages")


@cli.command(name="movie")
@click.option("--volume", required=True, help="tomogram (MRC)")
@click.option("--masks", required=True, help="label volume (.npy or MRC)")
@click.option("--output", default="segmentation.gif", show_default=True)
def movie(volume, masks, output):
    """Animated z-sweep GIF of a segmentation."""
    from saber_tpu.utils.io import read_mrc
    from saber_tpu.visualization.results import export_movie
    vol, _ = read_mrc(volume)
    lab = np.load(masks) if masks.endswith(".npy") else read_mrc(masks)[0]
    export_movie(vol, lab, output)
    click.echo(f"wrote {output}")
