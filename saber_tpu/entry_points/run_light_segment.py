"""`saber segment light` — light-microscopy movie propagation workflow
(reference saber/entry_points/run_light_segment.py:49-98). Same seed-and-
propagate core as fib but with light_modality preprocessing (0-255)."""

from typing import Optional

import click
import numpy as np

from saber_tpu.config import (AMGConfig, SAM2AdapterConfig,
                              sam3_adapter_config)
from saber_tpu.segmenters.propagation import propagationSegmenter
from saber_tpu.utils.io import read_movie


def run_light_segment(input: str, output: str = "light_masks.npy",
                      sam2_cfg: str = "small",
                      model_config: Optional[str] = None,
                      model_weights: Optional[str] = None,
                      target_class: int = 1, ini_depth: int = 10,
                      nframes: Optional[int] = None,
                      min_mask_area: int = 100, save_movie: bool = True,
                      image_size: int = 1024,
                      amg_cfg=None, parallel_seeds: bool = False,
                      batched_seeds: bool = False,
                      num_devices=None, text_prompt: Optional[str] = None):
    vol = read_movie(input)

    if text_prompt:
        # SAM3 iff a text prompt is given (reference run_light_segment.py:81-82)
        cfg = sam3_adapter_config(text_prompt, light_modality=True,
                                  min_mask_area=min_mask_area)
    elif model_config is not None:
        from saber_tpu.classifier.predictor import Predictor
        classifier = Predictor(model_config, model_weights)
        cfg = SAM2AdapterConfig(classifier=classifier, light_modality=True,
                                min_mask_area=min_mask_area,
                                image_size=image_size)
    else:
        cfg = SAM2AdapterConfig(cfg=sam2_cfg, light_modality=True,
                                amg_cfg=amg_cfg or AMGConfig(sam2_cfg=sam2_cfg),
                                min_mask_area=min_mask_area,
                                image_size=image_size)

    seg = propagationSegmenter(cfg=cfg, min_mask_area=min_mask_area)
    if parallel_seeds:
        masks = seg.parallel_segment(vol, ini_depth=ini_depth,
                                     nframes=nframes,
                                     target_class=target_class,
                                     text_prompt=text_prompt,
                                     num_devices=num_devices)
    elif batched_seeds:
        masks = seg.batched_segment(vol, ini_depth=ini_depth,
                                    nframes=nframes,
                                    target_class=target_class,
                                    text_prompt=text_prompt)
    else:
        masks = seg.segment(vol, ini_depth=ini_depth, nframes=nframes,
                            target_class=target_class,
                            text_prompt=text_prompt)
    np.save(output, masks)
    if save_movie:
        from saber_tpu.visualization.results import export_movie
        export_movie(vol, masks, output.replace(".npy", ".gif"))
    return masks


@click.command(name="light")
@click.option("--input", required=True, help="TIFF glob or movie directory")
@click.option("--output", default="light_masks.npy", show_default=True)
@click.option("--sam2-cfg", default="small", show_default=True,
              type=click.Choice(["tiny", "small", "base", "large"]))
@click.option("--model-config", default=None)
@click.option("--model-weights", default=None)
@click.option("--target-class", default=1, show_default=True)
@click.option("--ini-depth", default=10, show_default=True)
@click.option("--nframes", type=int, default=None)
@click.option("--min-mask-area", default=100, show_default=True)
@click.option("--parallel-seeds", is_flag=True,
              help="farm seed propagations over all chips")
@click.option("--batched-seeds", is_flag=True,
              help="batch all seeds into one propagation scan "
                   "(encode each slice once)")
@click.option("--num-devices", type=int, default=None)
@click.option("--text-prompt", default=None,
              help="text concept → SAM3 backend")
def light(**kwargs):
    """Segment light-microscopy movies by seed-and-propagate."""
    run_light_segment(**kwargs)
