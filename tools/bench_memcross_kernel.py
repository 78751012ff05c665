"""On-chip block-size sweep for the memory-attention CROSS-attention flash
call (models/memory.py cross_attn_image): B=4 objects, T=4096 queries,
S=8256 memory tokens (cond 4096 + 1 ring frame 4096 + 64 obj-ptr tokens at
num_maskmem=2), H=1, D=256, additive validity bias present — the tracking
step's largest single GEMM family (~554 GF across 4 layers, roofline in
docs/benchmarks.md).

    python tools/bench_memcross_kernel.py [bq,bk ...]

Defaults sweep a small grid. Loop INSIDE one jit (relay RPC floor rule).
Needed FLOPs = 4*B*T*S*D per call.
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

    b, t, s, h, d = 4, 4096, 8256, 1, 256
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    if jax.default_backend() == "cpu":
        t, s = 512, 1088
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)) * 0.1, dt)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.1, dt)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.1, dt)
    bias = jnp.where(jnp.arange(s)[None, :] < s - 32, 0.0, -1e9).astype(
        jnp.float32) * jnp.ones((b, 1), jnp.float32)
    # production parity: the cross call runs with fused-RoPE tables
    # (models/memory.py fused_rope branch), which pushes kv_bytes past the
    # resident budget → streamed kernel. Identity rows for ptr tokens.
    ang_q = rng.standard_normal((t, d // 2)).astype(np.float32)
    ang_k = rng.standard_normal((s, d // 2)).astype(np.float32)
    ang_k[-64:] = 0.0
    rope_q = (jnp.asarray(np.cos(ang_q)), jnp.asarray(np.sin(ang_q)))
    rope_k = (jnp.asarray(np.cos(ang_k)), jnp.asarray(np.sin(ang_k)))
    reps = int(os.environ.get("SABER_BENCH_REPS", "30"))
    flops = 4 * b * t * s * d

    configs = [tuple(map(int, a.split(","))) for a in sys.argv[1:]] or [
        (256, 512), (256, 1024), (256, 2048), (512, 1024), (512, 2048),
        (256, 4608), (512, 4608), (256, 9216), (128, 9216), (1024, 2048)]
    for bq, bk in configs:
        @jax.jit
        def chained(qq, kk, vv, bb, bq=bq, bk=bk):
            def body(i, acc):
                o = flash_attention(acc, kk, vv, bias=bb,
                                    block_q=bq, block_k=bk,
                                    rope_q=rope_q, rope_k=rope_k)
                return o.astype(acc.dtype)
            return jax.lax.fori_loop(0, reps, body, qq)

        try:
            np.asarray(chained(q, k, v, bias)[:1, :1, :1, :1])
            t0 = time.perf_counter()
            np.asarray(chained(q, k, v, bias)[:1, :1, :1, :1])
            dt_s = (time.perf_counter() - t0) / reps
            print(f"bq={bq:>5} bk={bk:>5}  {dt_s * 1e3:7.3f} ms/call  "
                  f"{flops / dt_s / 1e12:6.1f} TF/s (needed)", flush=True)
        except Exception as e:
            print(f"bq={bq:>5} bk={bk:>5}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
