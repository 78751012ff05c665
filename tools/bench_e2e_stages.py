"""Per-stage timing of the e2e 512³ workload on the current backend.

Mirrors bench.py's SABER_BENCH_MODE=e2e flow but forces a host sync after
every stage so each cost is attributable (the bench itself overlaps them).
Run on the TPU relay after bench.py has populated the compile cache:

    python tools/bench_e2e_stages.py

Env knobs: SABER_BENCH_CFG (large), SABER_BENCH_FRAMES (512),
SABER_BENCH_SIDE (512), SABER_BENCH_IMAGE (1024).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/saber_tpu/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from saber_tpu.config import AMGConfig, SAM2AdapterConfig
    from saber_tpu.ops import preprocessing as prep
    from saber_tpu.ops.gaussian import gaussian_smoothing
    from saber_tpu.segmenters.tomo import tomoSegmenter

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg_name = os.environ.get("SABER_BENCH_CFG", "large")
    depth = int(os.environ.get("SABER_BENCH_FRAMES", "512"))
    side = int(os.environ.get("SABER_BENCH_SIDE", "512"))
    image_size = int(os.environ.get("SABER_BENCH_IMAGE", "1024"))
    if not on_tpu:
        cfg_name, depth, side, image_size = "tiny", 8, 64, 128

    marks = [("t0", time.perf_counter())]

    def mark(name):
        marks.append((name, time.perf_counter()))
        print(f"{name}: {marks[-1][1] - marks[-2][1]:.2f} s", flush=True)

    amg_cfg = AMGConfig(sam2_cfg=cfg_name, pred_iou_thresh=0.05,
                        stability_score_thresh=0.0, max_masks=8)
    cfg = SAM2AdapterConfig(cfg=cfg_name, image_size=image_size,
                            amg_cfg=amg_cfg,
                            dtype="bfloat16" if on_tpu else "float32",
                            min_mask_area=10)
    seg = tomoSegmenter(cfg=cfg, min_mask_area=10)
    # force param materialization with a tiny transfer
    np.asarray(jax.tree_util.tree_leaves(seg.adapter.params)[0][..., :1])
    mark("build model + init params")

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((depth, side, side)).astype(np.float32) * 0.1
    z0, z1 = depth // 4, 3 * depth // 4
    q = side // 4
    vol[z0:z1, q:3 * q, q:3 * q] += 2.0
    vol[z0:z1, q // 2:q, q // 2:q] += 2.5
    mark("make volume (host)")

    vol_dev = prep.upload_volume(vol)          # fp16 wire, widened on device
    np.asarray(vol_dev[0, 0, :1])
    mark("volume upload")

    sm = prep.normalize(gaussian_smoothing(vol_dev, 5, dim=0))
    np.asarray(sm[0, 0, :1])
    mark("smooth + normalize")

    zc = depth // 2
    img = prep.prepare(prep.project_tomogram(sm, zc, 10), to_rgb=True)
    img_np = np.asarray(img)
    mark("project + prepare (+download)")

    masks = seg.adapter.segment_image_2d(img_np[..., 0])
    mark("AMG generate (cold-ish)")
    masks = seg.adapter.segment_image_2d(img_np[..., 0])
    mark("AMG generate (warm)")
    print(f"  masks: {len(masks)}")

    seg.adapter.set_volume(sm)
    mark("set_volume")

    seed = np.stack([m["segmentation"] for m in masks]) if masks else \
        np.zeros((1, side, side), np.float32)
    out = seg.adapter.segment_volume(zc, masks=seed, min_presence_score=0.0)
    mark("segment_volume (first call: program loads + exec)")
    seg.adapter.reset_state()
    out = seg.adapter.segment_volume(zc, masks=seed, min_presence_score=0.0)
    mark("segment_volume (warm)")
    warm = (["volume upload", "smooth + normalize",
             "project + prepare (+download)", "AMG generate (warm)",
             "segment_volume (warm)"])
    d = dict((n, t) for (n, t) in
             ((marks[i][0], marks[i][1] - marks[i - 1][1])
              for i in range(1, len(marks))))
    print(f"  labels: {out.max()}  total: "
          f"{marks[-1][1] - marks[0][1]:.2f} s")
    print(f"  WARM e2e (upload+pre+AMG+segvol): "
          f"{sum(d[n] for n in warm):.2f} s  "
          f"(compute-only, no upload: {sum(d[n] for n in warm[1:]):.2f} s)")


if __name__ == "__main__":
    main()
