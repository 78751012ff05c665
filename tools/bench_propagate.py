"""A/B the propagation step on the current backend.

Measures VideoCore.propagate_slab (memory attention + decode + memory
encode per frame) with the fused-RoPE flash path vs the XLA-rotation
path (SABER_FUSED_ROPE=0). Run twice:

    python tools/bench_propagate.py            # fused RoPE (default)
    SABER_FUSED_ROPE=0 python tools/bench_propagate.py

Env knobs: SABER_BENCH_CFG (default large), SABER_BENCH_IMAGE (1024),
SABER_BENCH_OBJECTS (4), SABER_BENCH_FRAMES (16), SABER_BENCH_MASKMEM (2).
Prints slices/sec and ms/frame for the propagation stage alone (encoder
excluded — frames are pre-encoded).
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

    from saber_tpu.models.sam2 import build_sam2
    from saber_tpu.models.video import VideoCore, init_state

    on_tpu = jax.default_backend() == "tpu"
    cfg_name = os.environ.get("SABER_BENCH_CFG", "large")
    image_size = int(os.environ.get("SABER_BENCH_IMAGE", "1024"))
    n_objects = int(os.environ.get("SABER_BENCH_OBJECTS", "4"))
    n_frames = int(os.environ.get("SABER_BENCH_FRAMES", "16"))
    num_maskmem = int(os.environ.get("SABER_BENCH_MASKMEM", "2"))
    if not on_tpu:
        cfg_name, image_size, n_frames = "tiny", 128, 4

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model, params = build_sam2(cfg_name, image_size=image_size, dtype=dtype,
                               num_maskmem=num_maskmem)
    core = VideoCore(model)

    rng = np.random.default_rng(0)
    frames_img = jnp.asarray(rng.standard_normal(
        (n_frames, image_size, image_size, 3)).astype(np.float32))
    seed_masks = np.zeros((n_objects, image_size, image_size), np.float32)
    for i in range(n_objects):
        s = image_size // 8
        seed_masks[i, (2 * i + 1) * s // 2:(2 * i + 3) * s // 2, s:3 * s] = 1.0

    bb = core.encode_batch(params, frames_img)
    state = init_state(n_objects, core.cfg)
    bb0 = jax.tree.map(lambda x: x[:1] if getattr(x, "ndim", 0) == 4 else x,
                       bb)
    state, _ = core.seed(params, bb0, jnp.asarray(seed_masks),
                         jnp.asarray(0), state)
    fr = VideoCore.slab_frames(bb)
    idx = jnp.arange(1, n_frames + 1)

    def run():
        _, (low, scores) = core.propagate_slab(
            params, state, fr, idx, jnp.asarray(1.0))
        return low

    # warmup MUST force execution with a host transfer (remote backends
    # defer compilation until then; block_until_ready is unreliable there)
    np.asarray(run()[..., :1])
    reps = 5 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        run()
    np.asarray(run()[..., :1])
    dt = (time.perf_counter() - t0) / reps
    mode = "fused-rope" if os.environ.get("SABER_FUSED_ROPE", "1") != "0" \
        else "xla-rope"
    print(f"propagate [{mode}] hiera-{cfg_name} {image_size}px "
          f"{n_objects} obj maskmem={num_maskmem}: "
          f"{n_frames / dt:.2f} slices/s ({1e3 * dt / n_frames:.1f} ms/frame)",
          file=sys.stderr)
    print(f'{{"mode": "{mode}", "slices_per_sec": {n_frames / dt:.3f}}}')


if __name__ == "__main__":
    main()
