"""Standalone on-chip bench of ops/fused_block.fused_mlp at hiera shapes.

One config per process (the kernel knobs are module-level env reads):

    SABER_MLP_FORCE=tm,hc SABER_GELU=exact python tools/bench_mlp_kernel.py [stage]

Stages are hiera-L at 1024²/batch 8: 1 → (524288, 144, 576),
2 → (131072, 288, 1152), 3 → (32768, 576, 2304), 4 → (8192, 1152, 4608).
Prints ms/call and achieved TFLOP/s (16·m·c² needed FLOPs, padding
excluded). Relay note: every distinct config is a new program (~45-60 s
first call); the measured loop forces execution with a host transfer.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = {1: (524288, 144, 576), 2: (131072, 288, 1152),
          3: (32768, 576, 2304), 4: (8192, 1152, 4608)}


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/saber_tpu/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from saber_tpu.ops import fused_block as fb

    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    m, c, hid = STAGES[stage]
    if jax.default_backend() == "cpu":
        m = min(m, 2048)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32) * 0.5, dt)
    s = jnp.ones((c,), jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hid)).astype(np.float32)
                     * c ** -0.5, dt)
    b1 = jnp.zeros((hid,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hid, c)).astype(np.float32)
                     * hid ** -0.5, dt)
    b2 = jnp.zeros((c,), jnp.float32)

    tm, hc = fb._pick_mlp_blocks(m, c, hid, jnp.dtype(dt).itemsize)
    print(f"stage {stage}: m={m} c={c} hid={hid}  blocks tm={tm} hc={hc} "
          f"gelu={fb._GELU_MODE}", flush=True)

    # loop INSIDE one jit (one RPC, one program): chaining host-side calls
    # measured the relay's per-RPC dispatch floor (~1.5-2 ms), not the
    # kernel — the first sweep's stage-4 "1.6 ms/call" was dispatch-bound
    reps = int(os.environ.get("SABER_BENCH_REPS", "50"))

    @jax.jit
    def chained(v):
        return jax.lax.fori_loop(
            0, reps, lambda i, t: fb.fused_mlp(t, s, b, w1, b1, w2, b2), v)

    np.asarray(chained(x)[:1, :1])
    t0 = time.perf_counter()
    np.asarray(chained(x)[:1, :1])
    dt_s = (time.perf_counter() - t0) / reps
    flops = 16 * m * c * c
    print(f"{dt_s * 1e3:.3f} ms/call  {flops / dt_s / 1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
