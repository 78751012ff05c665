"""Capture + summarize a device trace of the fused encoder alone.

Same xplane method as profile_direction.py, scoped to encode_image so
per-op shares map directly onto ops/fused_block.py and the q-pool /
patch-embed / FPN glue (docs/benchmarks.md round-2 findings).

    python tools/profile_encoder.py [cfg] [image_size] [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_direction import summarize_xplane  # noqa: E402


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
    if not on_tpu:
        cfg, size, batch = "tiny", 128, 2
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    fused = os.environ.get("SABER_PROF_FUSED", "1") != "0"
    logdir = os.environ.get("SABER_TRACE_DIR", "/tmp/saber_enc_trace")
    topk = int(os.environ.get("SABER_TOPK", "40"))

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal(
        (batch, size, size, 3)).astype(np.float32))
    model, params = build_sam2(cfg, image_size=size, dtype=dtype,
                               fused_encoder=fused)
    fn = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, method=SAM2.encode_image))

    def once():
        out = fn(params, frames)
        np.asarray(out["vision_features"][..., :1])

    once()
    # chain a few calls, sync once — per-call RPC latency would otherwise
    # dominate (CLAUDE.md relay facts)
    reps = int(os.environ.get("SABER_PROF_REPS", "5"))
    t0 = time.perf_counter()
    for _ in range(reps - 1):
        fn(params, frames)
    once()
    warm = (time.perf_counter() - t0) / reps
    print(f"warm encode: {warm * 1e3:.1f} ms for batch {batch} "
          f"({batch / warm:.1f} slices/s)", flush=True)

    if os.environ.get("SABER_PROF_TRACE", "1") != "0":
        jax.profiler.start_trace(logdir)
        once()
        jax.profiler.stop_trace()
        summarize_xplane(logdir, topk)


if __name__ == "__main__":
    main()
