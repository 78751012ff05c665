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


from saber_tpu.entry_points.slurm import micrographs_slurm, tomograms_slurm  # noqa: E402

slurm_routines.add_command(tomograms_slurm)
slurm_routines.add_command(micrographs_slurm)
routines.add_command(slurm_routines)


if __name__ == "__main__":
    routines()
