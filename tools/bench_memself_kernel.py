"""On-chip block-size sweep for the memory-attention SELF-attention flash
call (models/memory.py use_flash branch): B=4 objects, T=S=4096 tokens,
H=1, D=256 — the profiler's top tracking-step cost (~4.4 ms/slice across
4 layers at ~32% MXU, round-4 trace).

    python tools/bench_memself_kernel.py [bq,bk ...]

Defaults sweep a small grid. Loop INSIDE one jit (relay RPC floor rule,
docs/benchmarks.md methodology). Needed FLOPs = 4·B·T·S·D.
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

    from saber_tpu.ops.flash_attention import flash_attention

    b, t, h, d = 4, 4096, 1, 256
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    if jax.default_backend() == "cpu":
        t = 512
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)) * 0.1, dt)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)) * 0.1, dt)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)) * 0.1, dt)
    reps = int(os.environ.get("SABER_BENCH_REPS", "30"))
    flops = 4 * b * t * t * d

    configs = [tuple(map(int, a.split(","))) for a in sys.argv[1:]] or [
        (256, 512), (256, 1024), (256, 2048), (512, 1024), (512, 2048),
        (512, 4096), (1024, 2048), (1024, 4096), (2048, 4096)]
    for bq, bk in configs:
        @jax.jit
        def chained(qq, kk, vv, bq=bq, bk=bk):
            def body(i, acc):
                o = flash_attention(acc, kk, vv, block_q=bq, block_k=bk)
                return o.astype(acc.dtype)
            return jax.lax.fori_loop(0, reps, body, qq)

        try:
            np.asarray(chained(q, k, v)[:1, :1, :1, :1])
            t0 = time.perf_counter()
            np.asarray(chained(q, k, v)[:1, :1, :1, :1])
            dt_s = (time.perf_counter() - t0) / reps
            print(f"bq={bq:>5} bk={bk:>5}  {dt_s * 1e3:7.3f} ms/call  "
                  f"{flops / dt_s / 1e12:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"bq={bq:>5} bk={bk:>5}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
