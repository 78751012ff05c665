"""Measure BASELINE.json configs 1 and 4 on the current backend.

The driver's five reference workloads (BASELINE.json "configs") are
covered by bench.py modes 2/3 (slab headline, AMG, e2e) and the
multichip dryrun (5); this tool records the remaining two:

  config 1 — zero-shot segmentation of ONE 2D EM micrograph
             (SAM2 hiera-tiny, single point-grid prompt — no crop
             layers, reference amg.py:7-17 grid semantics). Runs on
             whatever backend is active; pass JAX_PLATFORMS=cpu for the
             baseline-spec CPU number.
  config 4 — classifier-filtered pipeline: the expert head scores
             candidate masks post-decoder (reference
             classifier/models/predictor.py:168-206 batch scoring).

Usage:  python tools/bench_workloads.py [1|4|all]

Prints one JSON line per workload. Warm-up runs force host transfers
(the relay defers compilation otherwise — docs/benchmarks.md
methodology notes).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    return np.asarray(x)


def bench_config1():
    import jax

    from saber_tpu.config import AMGConfig, SAM2AdapterConfig
    from saber_tpu.segmenters.micro import cryoMicroSegmenter

    on_tpu = jax.default_backend() not in ("cpu",)
    image_size = 512
    amg = AMGConfig(sam2_cfg="tiny", npoints=16, points_per_batch=64,
                    crop_n_layers=0, use_m2m=False, max_masks=32,
                    pred_iou_thresh=0.05, stability_score_thresh=0.0)
    cfg = SAM2AdapterConfig(cfg="tiny", image_size=image_size, amg_cfg=amg,
                            dtype="bfloat16" if on_tpu else "float32")
    seg = cryoMicroSegmenter(cfg=cfg, min_mask_area=20)

    rng = np.random.default_rng(0)
    img = (rng.standard_normal((600, 600)).astype(np.float32) * 4 + 100)
    img[200:380, 150:330] += 25.0   # one blob an AMG grid point will hit

    masks = seg.segment(img, display=False)           # warm (compiles)
    t0 = time.perf_counter()
    masks = seg.segment(img, display=False)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "config1 2D micrograph zero-shot (hiera-tiny, 600², "
                  f"16² grid, {jax.default_backend()})",
        "value": round(dt, 3), "unit": "s/image warm",
        "n_masks": len(masks or [])}))


def bench_config4():
    import jax
    import jax.numpy as jnp
    import yaml
    from flax import serialization

    from saber_tpu.classifier.models import get_classifier_model
    from saber_tpu.classifier.predictor import Predictor
    from saber_tpu.models.sam2 import build_sam2

    on_tpu = jax.default_backend() not in ("cpu",)
    n_masks = 64 if on_tpu else 8

    with tempfile.TemporaryDirectory() as d:
        model = get_classifier_model("SAM2", 3)
        backbone, _ = build_sam2("tiny", image_size=320)
        fs = backbone.config.feat_size
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, fs, fs, 256)),
                            jnp.zeros((1, fs, fs)))["params"]
        with open(os.path.join(d, "best_model.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(params)))
        with open(os.path.join(d, "model_config.yaml"), "w") as f:
            yaml.safe_dump({"model_type": "SAM2", "num_classes": 3,
                            "sam2_cfg": "tiny",
                            "backbone_image_size": 320}, f)
        pred = Predictor(d)

        rng = np.random.default_rng(0)
        img = rng.standard_normal((600, 600)).astype(np.float32)
        masks = np.zeros((n_masks, 600, 600), bool)
        for i in range(n_masks):                      # candidate boxes
            y, x = 40 + (i * 37) % 400, 40 + (i * 53) % 400
            masks[i, y:y + 120, x:x + 120] = True

        _sync(pred.batch_predict(img, masks))         # warm (compiles)
        t0 = time.perf_counter()
        probs = _sync(pred.batch_predict(img, masks))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "config4 classifier mask scoring (SAM2-tiny "
                      f"backbone, 320², {jax.default_backend()})",
            "value": round(n_masks / dt, 1), "unit": "masks/s warm",
            "n_masks": n_masks, "s_total": round(dt, 3),
            "probs_shape": list(probs.shape)}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("1", "all"):
        bench_config1()
    if which in ("4", "all"):
        bench_config4()
