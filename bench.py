"""Headline benchmark: tomogram z-slices/sec/chip through the full SAM2
propagation pipeline (encoder + memory attention + decoder + memory
encoder per slice).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver's north-star rate (a 512-slice
tomogram in 60 s on one chip of a v5e-8 ⇒ 8.533 slices/sec/chip; the
reference publishes no numbers — BASELINE.md).

Env knobs: SABER_BENCH_CFG (tiny/small/base/large, default large),
SABER_BENCH_FRAMES (default 16), SABER_BENCH_IMAGE (default 1024).
"""

import json
import os
import time

import numpy as np

BASELINE_SLICES_PER_SEC = 512.0 / 60.0  # north-star, BASELINE.md


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

    cfg_name = os.environ.get("SABER_BENCH_CFG", "large")
    n_frames = int(os.environ.get("SABER_BENCH_FRAMES", "16"))
    image_size = int(os.environ.get("SABER_BENCH_IMAGE", "1024"))
    chunk = int(os.environ.get("SABER_BENCH_CHUNK", "8"))
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

    def run_volume():
        """Encode all frames in chunks and propagate through every slice."""
        state = init_state(n_objects, core.cfg)
        bb0 = core.encode_batch(params, frames[:1])
        state, _ = core.seed(params, bb0, seed_masks, jnp.asarray(0), state)
        outs = []
        for c0 in range(0, n_frames, chunk):
            sl = frames[c0:c0 + chunk]
            bb = core.encode_batch(params, sl)
            fr = VideoCore.slab_frames(bb)
            idx = jnp.arange(c0, c0 + sl.shape[0])
            state, (low, scores) = core.propagate_slab(
                params, state, fr, idx, jnp.asarray(1.0))
            outs.append(low)
        # force full execution with a host transfer (block_until_ready is
        # not reliable on the experimental remote-TPU platform)
        checksum = float(np.asarray(jnp.sum(outs[-1])))
        assert np.isfinite(checksum)
        return outs

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
