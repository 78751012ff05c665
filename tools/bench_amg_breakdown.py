"""Attribute AMG warm time at large K: merged vs split-finalize programs.

CLAUDE.md open item 2: the one-program generate is ~12.5 s warm at
max_masks=256 (hiera-base defaults) where the round-3 split pipeline was
6.6 s — but those two measurements straddle the full-res-stability
default flip (commit a97cd59), so the regression may be the scoring, not
the merge. This tool bisects on-chip, warm, same code state:

  merged  — the shipped one-program generate (device time + host pull)
  split   — the same math as TWO programs: sweeps (crop resize + encode +
            grid sweep + m2m) then finalize (cross-crop NMS + top-K +
            paste + packbits); bufs stay device-resident between them
  lowres  — merged with stability_fullres=False (round-2 scoring)
  nom2m   — merged with use_m2m=False (isolates the refine pass)

Run on the TPU relay (each variant's first call pays the ~45-60 s
program-load cost once; timings below are warm):

    python tools/bench_amg_breakdown.py

Env: SABER_BENCH_CFG (base), SABER_BENCH_IMAGE (1024), SABER_K (256),
SABER_AMG_VARIANTS (merged,split,lowres), SABER_REPS (2).
"""

import os
import time

import numpy as np


def build_split(amg, h, w, layer_plan):
    """Two-program variant of AutomaticMaskGenerator._build_generate_fn:
    program 1 = per-layer crop resize + encoder + grid sweeps, program 2 =
    the cross-crop finalize. Same math, different program boundary."""
    import jax
    import jax.numpy as jnp

    from saber_tpu import amg as amg_mod

    cfg = amg.cfg
    model_size = amg.model.config.image_size
    mcls = type(amg.model)
    k_mult = 3 if cfg.multimask_output else 1
    layer_shapes = tuple(
        (len(boxes), min(cfg.max_masks, n_side ** 2 * k_mult))
        for boxes, n_side, _ in layer_plan)
    n_tot = sum(c * cap for c, cap in layer_shapes)
    k_out = min(cfg.max_masks, n_tot)
    multi_crop = sum(len(b) for b, _, _ in layer_plan) > 1
    finalize = amg._build_finalize_fn(layer_shapes, h, w, k_out, multi_crop)
    mean = jnp.asarray(amg_mod._IMAGENET_MEAN)
    std = jnp.asarray(amg_mod._IMAGENET_STD)

    def sweeps(params, img):
        bufs, crop_params = [], []
        for boxes, n_side, per_crop in layer_plan:
            resized = jnp.stack([
                jax.image.resize(img[c[1]:c[3], c[0]:c[2]],
                                 (model_size, model_size, 3),
                                 method="bilinear")
                for c in boxes])
            resized = (resized - mean) / std
            bb = amg.model.apply({"params": params}, resized,
                                 method=mcls.encode_video_frames)
            decode_bb = {"vision_features": bb["vision_features"],
                         "backbone_fpn": list(bb["backbone_fpn"])}
            chunks, chunk_valid = amg._grid_chunks(n_side, per_crop)
            buf = amg._layer_fn(n_side, per_crop, len(boxes))(
                params, decode_bb, chunks, chunk_valid)
            bufs.append(buf)
            crop_params.append(jnp.asarray(
                [[c[0], c[1], c[2] - c[0], c[3] - c[1]] for c in boxes],
                jnp.float32))
        # tiny in-program summary so the caller can sync without slicing
        s = sum(jnp.sum(b["iou"]) for b in bufs)
        return bufs, crop_params, s

    return jax.jit(sweeps), jax.jit(finalize), k_out


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/saber_tpu/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from saber_tpu.amg import build_amg
    from saber_tpu.config import AMGConfig
    from saber_tpu.models.sam2 import build_sam2
    from saber_tpu.ops import preprocessing as prep

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg_name = os.environ.get("SABER_BENCH_CFG", "base")
    image_size = int(os.environ.get("SABER_BENCH_IMAGE", "1024"))
    k = int(os.environ.get("SABER_K", "256"))
    reps = int(os.environ.get("SABER_REPS", "2"))
    variants = os.environ.get(
        "SABER_AMG_VARIANTS", "merged,split,lowres").split(",")
    if not on_tpu:
        cfg_name, image_size, k = "tiny", 128, 32

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model, params = build_sam2(cfg_name, image_size=image_size, dtype=dtype)
    np.asarray(jax.tree_util.tree_leaves(params)[0].ravel()[:1])
    print(f"model: hiera-{cfg_name} {image_size}px K={k}", flush=True)

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((64, image_size, image_size)).astype(np.float32)
    for i in range(6):
        c = 100 + 120 * i
        vol[:, c % image_size:(c % image_size) + 80,
            (c * 3) % image_size:((c * 3) % image_size) + 80] += 2.5
    img = np.asarray(prep.prepare(
        jnp.asarray(prep.project_tomogram(jnp.asarray(vol), 32, 10)),
        to_rgb=True))
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    h, w = img.shape[:2]
    img_dev = jnp.asarray(img, jnp.float32)

    def amg_cfg(**kw):
        base = dict(max_masks=k)
        base.update(kw)
        if not on_tpu:
            base.update(npoints=8, points_per_batch=16, crop_n_layers=1)
        return AMGConfig(**base)

    def time_merged(tag, cfg):
        amg = build_amg(model, params, cfg)
        layer_plan, _, _ = amg._make_plan(h, w)
        gkey_fn, k_out = amg._build_generate_fn(h, w, layer_plan)
        res = gkey_fn(params, img_dev)
        np.asarray(res["area"])                     # force: warmup done
        t0 = time.perf_counter()
        for _ in range(reps):
            res = gkey_fn(params, img_dev)
            np.asarray(res["area"])                 # tiny sync
        dev = (time.perf_counter() - t0) / reps
        t0 = time.perf_counter()
        full = jax.tree.map(np.asarray, res)        # the host pull
        pull = time.perf_counter() - t0
        mb = sum(a.nbytes for a in jax.tree_util.tree_leaves(full)) / 1e6
        print(f"{tag}: {dev:.2f} s device-warm, +{pull:.2f} s host pull "
              f"({mb:.1f} MB)", flush=True)
        return dev

    results = {}
    if "merged" in variants:
        results["merged"] = time_merged("merged (shipped)", amg_cfg())
    if "lowres" in variants:
        results["lowres"] = time_merged(
            "lowres-stability", amg_cfg(stability_fullres=False))
    if "nom2m" in variants:
        results["nom2m"] = time_merged("no-m2m", amg_cfg(use_m2m=False))
    if "split" in variants:
        amg = build_amg(model, params, amg_cfg())
        layer_plan, _, _ = amg._make_plan(h, w)
        sweeps_fn, fin_fn, k_out = build_split(amg, h, w, layer_plan)
        bufs, cps, s = sweeps_fn(params, img_dev)
        np.asarray(s)
        res = fin_fn(bufs, cps)
        np.asarray(res["area"])
        t_sw = t_fin = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            bufs, cps, s = sweeps_fn(params, img_dev)
            np.asarray(s)
            t_sw += time.perf_counter() - t0
            t0 = time.perf_counter()
            res = fin_fn(bufs, cps)
            np.asarray(res["area"])
            t_fin += time.perf_counter() - t0
        print(f"split: sweeps {t_sw / reps:.2f} s + finalize "
              f"{t_fin / reps:.2f} s = {(t_sw + t_fin) / reps:.2f} s",
              flush=True)
        results["split"] = (t_sw + t_fin) / reps

    print({k_: round(v, 2) for k_, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
