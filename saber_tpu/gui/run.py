"""GUI launch commands (reference saber/gui/run.py).

``web`` runs the dependency-free browser annotator; ``gui`` launches the
Qt annotation tool and is gated on PyQt5 (optional extra, reference
README.md:30-34)."""

import click


@click.command(name="web")
@click.option("--input", required=True, help="candidate-mask zarr")
@click.option("--host", default="127.0.0.1", show_default=True)
@click.option("--port", default=8080, show_default=True)
def web(input, host, port):
    """Launch the browser-based annotation server (SSH-tunnel the port for
    remote/HPC use)."""
    from saber_tpu.gui.web.server import run_server
    run_server(input, host, port)


@click.command(name="gui")
@click.option("--input", required=True, help="candidate-mask zarr")
@click.option("--text", "text_mode", is_flag=True,
              help="free-text/hashtag annotation mode")
def gui(input, text_mode):
    """Launch the Qt annotation GUI (requires PyQt5)."""
    try:
        if text_mode:
            # full text-annotation viewer: drag-draw, acceptance, widget
            # panels (reference gui/text/zarr_text_gui.py text_gui:231)
            from saber_tpu.gui.text.segmentation_viewer import \
                launch_text_viewer as launch
        else:
            from saber_tpu.gui.base.zarr_gui import launch_gui as launch
    except ImportError as e:
        raise click.ClickException(
            "The Qt GUI requires PyQt5 (pip install saber-tpu[gui]); use "
            "`saber web` for the browser annotator instead.") from e
    launch(input)
