"""Encoder-only A/B bench: fused Pallas MultiScaleBlock vs flax path.

Runs on the default backend (real TPU in CI). Prints slices/sec for both
settings. Usage: python tools/bench_encoder.py [cfg] [image_size] [batch]
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
    from saber_tpu.models.sam2 import SAM2, build_sam2

    cfg = sys.argv[1] if len(sys.argv) > 1 else "large"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal(
        (batch, size, size, 3)).astype(np.float32))

    results = {}
    for fused in (False, True):
        model, params = build_sam2(cfg, image_size=size, dtype=dtype,
                                   fused_encoder=fused)
        fn = jax.jit(lambda p, x, m=model: m.apply(
            {"params": p}, x, method=SAM2.encode_image))
        out = fn(params, frames)
        np.asarray(out["vision_features"][..., :1])     # force compile+run
        reps = 5 if on_tpu else 1
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(params, frames)
        np.asarray(out["vision_features"][..., :1])
        dt = (time.perf_counter() - t0) / reps
        results[fused] = batch / dt
        print(f"fused={fused}: {batch / dt:.2f} slices/s "
              f"({dt * 1e3:.1f} ms/batch of {batch})", flush=True)
    print(f"speedup: {results[True] / results[False]:.3f}x")


if __name__ == "__main__":
    main()
