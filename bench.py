"""Headline benchmark: tomogram z-slices/sec/chip through the full SAM2
propagation pipeline (encoder + memory attention + decoder + memory
encoder per slice).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver's north-star rate (a 512-slice
tomogram in 60 s on one chip of a v5e-8 ⇒ 8.533 slices/sec/chip; the
reference publishes no numbers — BASELINE.md).

Env knobs: SABER_BENCH_CFG (tiny/small/base/large, default large),
SABER_BENCH_FRAMES (default 16), SABER_BENCH_IMAGE (default 1024),
SABER_BENCH_MODE:
  propagation (default) — the headline slices/sec number
  amg  — BASELINE config 2: full AMG (32×32 grid, 2 crop layers, m2m) on
         a slab-projection image; reports seconds/image
  e2e  — BASELINE config 3: tomoSegmenter.segment_vol on a synthetic
         512³ volume (AMG seeding + bidirectional propagation + presence
         gating); reports wall-clock seconds, vs_baseline = 60 s / value
"""

import json
import os
import time

import numpy as np

BASELINE_SLICES_PER_SEC = 512.0 / 60.0  # north-star, BASELINE.md
NORTH_STAR_E2E_SECONDS = 60.0


def _bench_amg(on_tpu: bool):
    """Full-defaults AMG over a synthetic slab projection (config 2)."""
    import jax.numpy as jnp

    from saber_tpu.amg import build_amg
    from saber_tpu.config import AMGConfig
    from saber_tpu.models.sam2 import build_sam2
    from saber_tpu.ops import preprocessing as prep

    cfg_name = os.environ.get("SABER_BENCH_CFG", "base")
    image_size = int(os.environ.get("SABER_BENCH_IMAGE", "1024"))
    if not on_tpu:
        cfg_name, image_size = "tiny", 128
    # optional threshold overrides: with random (unconverted) weights the
    # default 0.88 IoU gate passes nothing, which skips the host-side mask
    # unpack; permissive thresholds exercise the full many-mask finalize
    amg_kwargs = {}
    for env, key, cast in (("SABER_BENCH_IOU_THRESH", "pred_iou_thresh", float),
                           ("SABER_BENCH_STAB_THRESH", "stability_score_thresh", float),
                           ("SABER_BENCH_MAX_MASKS", "max_masks", int)):
        if os.environ.get(env):
            amg_kwargs[key] = cast(os.environ[env])
    amg_cfg = (AMGConfig(**amg_kwargs) if on_tpu else
               AMGConfig(npoints=8, points_per_batch=16, crop_n_layers=1,
                         max_masks=32))
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model, params = build_sam2(cfg_name, image_size=image_size, dtype=dtype)
    amg = build_amg(model, params, amg_cfg)

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((64, image_size, image_size)).astype(np.float32)
    for i in range(6):
        c = 100 + 120 * i
        vol[:, c % image_size:(c % image_size) + 80,
            (c * 3) % image_size:((c * 3) % image_size) + 80] += 2.5
    img = np.asarray(prep.prepare(
        jnp.asarray(prep.project_tomogram(jnp.asarray(vol), 32, 10)),
        to_rgb=True))

    masks = amg.generate(img)       # compile warmup
    reps = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(reps):
        masks = amg.generate(img)
    dt = (time.perf_counter() - t0) / reps
    return {
        "metric": f"AMG slab seeding (hiera-{cfg_name}, {image_size}px, "
                  f"{amg_cfg.npoints}² grid, {amg_cfg.crop_n_layers} crop "
                  f"layers, m2m={amg_cfg.use_m2m}; {len(masks)} masks)",
        "value": round(dt, 3),
        "unit": "sec/image",
        "vs_baseline": round(NORTH_STAR_E2E_SECONDS / dt, 3) if dt else 0.0,
    }


def _bench_e2e(on_tpu: bool):
    """tomoSegmenter.segment_vol on a synthetic volume (config 3)."""
    from saber_tpu.config import AMGConfig, SAM2AdapterConfig
    from saber_tpu.segmenters.tomo import tomoSegmenter

    cfg_name = os.environ.get("SABER_BENCH_CFG", "large")
    depth = int(os.environ.get("SABER_BENCH_FRAMES", "512"))
    image_size = int(os.environ.get("SABER_BENCH_IMAGE", "1024"))
    side = int(os.environ.get("SABER_BENCH_SIDE", "512"))
    if not on_tpu:
        cfg_name, depth, image_size, side = "tiny", 8, 128, 64
    # full grid/crop shape but permissive score thresholds + small capacity:
    # the driver runs without converted weights, where the default 0.7 IoU
    # gate would seed nothing and skip the propagation stage entirely
    amg_cfg = (AMGConfig(sam2_cfg=cfg_name, pred_iou_thresh=0.05,
                         stability_score_thresh=0.0, max_masks=8) if on_tpu
               else
               AMGConfig(sam2_cfg=cfg_name, npoints=4, points_per_batch=8,
                         crop_n_layers=0, use_m2m=False, max_masks=8,
                         pred_iou_thresh=0.05, stability_score_thresh=0.0))
    cfg = SAM2AdapterConfig(
        cfg=cfg_name, image_size=image_size, amg_cfg=amg_cfg,
        dtype="bfloat16" if on_tpu else "float32", min_mask_area=10)
    seg = tomoSegmenter(cfg=cfg, min_mask_area=10)

    rng = np.random.default_rng(0)
    vol = rng.standard_normal((depth, side, side)).astype(np.float32) * 0.1
    z0, z1 = depth // 4, 3 * depth // 4
    q = side // 4
    vol[z0:z1, q:3 * q, q:3 * q] += 2.0           # central organelle blob
    vol[z0:z1, q // 2:q, q // 2:q] += 2.5         # a smaller second object
    # SABER_BENCH_E2E_DTYPE=int16/int8: measure with an EM-at-rest source
    # dtype — ships RAW over the wire (ops/preprocessing.RAW_WIRE_DTYPES),
    # 2-4x fewer upload bytes than the fp32-source fp16 wire
    src_dtype = os.environ.get("SABER_BENCH_E2E_DTYPE")
    if src_dtype:
        info = np.iinfo(np.dtype(src_dtype))
        lo, hi = vol.min(), vol.max()
        scale = (hi - lo) if hi > lo else 1.0   # constant-volume guard
        vol = np.clip((vol - lo) / scale * (info.max - info.min)
                      + info.min, info.min, info.max).astype(src_dtype)

    def run_once():
        out = seg.segment(vol, thickness=10)
        if out is None:
            # AMG found no seeds (possible with random weights): still
            # measure the propagation stage with synthetic seed masks so
            # the e2e number always covers slab-seed + propagate + gate
            seed = np.zeros((2, side, side), np.float32)
            seed[0, q:3 * q, q:3 * q] = 1.0
            seed[1, q // 2:q, q // 2:q] = 1.0
            seg.adapter.set_volume(seg.vol if seg.vol is not None else vol)
            out = seg.adapter.segment_volume(depth // 2, masks=seed,
                                             min_presence_score=0.0)
        return out

    # warmup: the first call pays compiles AND (on remote-TPU links)
    # ~45-60 s of per-program loader overhead for every executable the
    # process touches; the timed run measures the warm pipeline
    run_once()
    t0 = time.perf_counter()
    out = run_once()
    dt = time.perf_counter() - t0
    n_masks = int(out.max()) if out is not None else 0
    return {
        "metric": f"e2e segment_vol {depth}×{side}×{side} "
                  f"(hiera-{cfg_name}: AMG seeding + bidirectional "
                  f"propagation + presence gating; {n_masks} objects)",
        "value": round(dt, 3),
        "unit": "seconds",
        "vs_baseline": round(NORTH_STAR_E2E_SECONDS / dt, 3) if dt else 0.0,
    }


def main():
    import jax

    # persistent compilation cache: remote-TPU compiles are slow; reuse
    # executables across bench runs/rounds
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/saber_tpu/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from saber_tpu.models.sam2 import build_sam2
    from saber_tpu.models.video import VideoCore, init_state

    mode = os.environ.get("SABER_BENCH_MODE", "propagation")
    if mode in ("amg", "e2e"):
        on_tpu = jax.default_backend() not in ("cpu",)
        result = _bench_amg(on_tpu) if mode == "amg" else _bench_e2e(on_tpu)
        print(json.dumps(result))
        return

    cfg_name = os.environ.get("SABER_BENCH_CFG", "large")
    # 64 frames amortize the per-volume seed the way real 512-slice
    # tomograms do (16-frame runs underrate the pipeline ~20%)
    n_frames = int(os.environ.get("SABER_BENCH_FRAMES", "64"))
    image_size = int(os.environ.get("SABER_BENCH_IMAGE", "1024"))
    # chunk=16 matches the adapter's production encode-chunk and measured
    # 30.41 vs 29.27 slices/s at chunk=8 on chip (2026-08-19 A/B): the
    # bigger encoder batch amortizes per-dispatch overhead and keeps the
    # MXU busier through the scan.
    chunk = int(os.environ.get("SABER_BENCH_CHUNK", "16"))
    n_objects = int(os.environ.get("SABER_BENCH_OBJECTS", "4"))

    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:  # CPU smoke fallback: keep it tiny
        cfg_name, n_frames, image_size, chunk = "tiny", 4, 128, 2

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model, params = build_sam2(cfg_name, image_size=image_size, dtype=dtype,
                               num_maskmem=2)
    core = VideoCore(model)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.standard_normal((n_frames, image_size, image_size, 3))
        .astype(np.float32))
    seed_masks = np.zeros((n_objects, image_size, image_size), np.float32)
    for i in range(n_objects):
        s = image_size // 8
        seed_masks[i, (2 * i + 1) * s // 2:(2 * i + 3) * s // 2, s:3 * s] = 1.0
    seed_masks = jnp.asarray(seed_masks)

    # ONE jitted program per volume: a lax.scan over chunk groups whose
    # body fuses encoder + per-frame tracking — the schedule segment_volume
    # ships (sam2_adapter._direction_program); the round-2 bench host-
    # looped encode/propagate per chunk, paying an RPC issue per program
    import jax as _jax

    n_chunks = n_frames // chunk
    mcls = type(model)

    @_jax.jit
    def volume_program(params, pstate, frames_all, idxs_all):
        def body(ps, inp):
            sl, idx = inp
            bb = model.apply({"params": params}, sl,
                             method=mcls.encode_image)
            ps, (low, scores) = core.propagate_slab(
                params, ps, VideoCore.slab_frames(bb), idx,
                jnp.asarray(1.0))
            return ps, low
        return jax.lax.scan(
            body, pstate,
            (frames_all.reshape(n_chunks, chunk, *frames_all.shape[1:]),
             idxs_all.reshape(n_chunks, chunk)))

    idxs = jnp.arange(n_frames)

    def run_volume():
        """Seed, then track every slice in one fused device program."""
        state = init_state(n_objects, core.cfg)
        bb0 = core.encode_batch(params, frames[:1])
        state, _ = core.seed(params, bb0, seed_masks, jnp.asarray(0), state)
        _, low = volume_program(params, state, frames, idxs)
        # force full execution with a host transfer (block_until_ready is
        # not reliable on the experimental remote-TPU platform)
        checksum = float(np.asarray(jnp.sum(low[-1])))
        assert np.isfinite(checksum)
        return low

    run_volume()  # compile warmup
    reps = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(reps):
        run_volume()
    dt = time.perf_counter() - t0
    slices_per_sec = reps * n_frames / dt

    if os.environ.get("SABER_BENCH_VERBOSE"):
        import sys

        def timed(fn, n=3):
            # warmup must include a transfer: remote backends defer compile
            # until execution is actually forced
            np.asarray(jax.tree_util.tree_leaves(fn())[0][..., :1])
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
            return (time.perf_counter() - t0) / n

        bb = core.encode_batch(params, frames[:chunk])
        t_enc = timed(lambda: core.encode_batch(params, frames[:chunk]))
        state = init_state(n_objects, core.cfg)
        state, _ = core.seed(params, jax.tree.map(
            lambda x: x[:1] if getattr(x, "ndim", 0) == 4 else x, bb),
            seed_masks, jnp.asarray(0), state)
        fr = VideoCore.slab_frames(bb)
        idx = jnp.arange(chunk)
        t_prop = timed(lambda: core.propagate_slab(
            params, state, fr, idx, jnp.asarray(1.0))[1])
        print(f"breakdown: encode {chunk / t_enc:.2f} slices/s, "
              f"propagate {chunk / t_prop:.2f} slices/s", file=sys.stderr)

    print(json.dumps({
        "metric": f"tomogram z-slices/sec/chip (SAM2 hiera-{cfg_name}, "
                  f"{image_size}px, {n_objects} objects, bf16)"
                  if on_tpu else
                  "tomogram z-slices/sec (CPU smoke, hiera-tiny)",
        "value": round(slices_per_sec, 3),
        "unit": "slices/sec/chip",
        "vs_baseline": round(slices_per_sec / BASELINE_SLICES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
