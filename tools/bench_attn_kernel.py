"""Standalone on-chip bench of ops/fused_block.fused_window_attention.

One config per process (knobs are module-level env reads):

    SABER_SOFTMAX=linear SABER_ATTN_BAND=256 python tools/bench_attn_kernel.py [stage]

Hiera-L stage shapes at 1024²/batch 8 (window_spec 8,4,16,8):
1 → (8,256,256,144) w8 h2, 2 → (8,128,128,288) w4 h4,
3 → (8,64,64,576) w16 h8, 4 → (8,32,32,1152) w8 h16.
Prints ms/call and achieved TFLOP/s over the NEEDED FLOPs
(8·T·C² qkv+proj, 4·T·t·hd attention — padding/mask waste excluded).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = {1: (256, 144, 8, 2), 2: (128, 288, 4, 4),
          3: (64, 576, 16, 8), 4: (32, 1152, 8, 16)}


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
    side, c, window, heads = STAGES[stage]
    b = 8
    if jax.default_backend() == "cpu":
        b, side = 1, min(side, 32)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((b, side, side, c)).astype(np.float32) * 0.5, dt)
    s = jnp.ones((c,), jnp.float32)
    bia = jnp.zeros((c,), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32)
                       * c ** -0.5, dt)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32)
                        * c ** -0.5, dt)
    bproj = jnp.zeros((c,), jnp.float32)

    layout = fb._ATTN_LAYOUT
    if layout == "auto":
        layout = "transposed" if heads >= 8 else "padded"
    xb = jnp.dtype(dt).itemsize
    hd = c // heads
    picked_t = (fb._pick_attn_blocks_t(side // window, window, c, heads,
                                       hd, xb)
                if layout == "transposed" else None)
    if picked_t is not None:
        blocks = f"transposed g={picked_t[0]} hg={picked_t[1]}"
    else:
        g, hg, hp = fb._pick_attn_blocks(side // window, window, c, heads,
                                         hd, xb)
        blocks = f"padded g={g} hg={hg} hp={hp}"
    print(f"stage {stage}: ({b},{side},{side},{c}) w={window} h={heads}  "
          f"{blocks} softmax={fb._SOFTMAX_MODE}", flush=True)

    def call(v):
        return fb.fused_window_attention(
            v, s, bia, wqkv, bqkv, wproj, bproj,
            window=window, num_heads=heads)

    # loop INSIDE one jit — host-side chaining measures the relay's
    # per-RPC dispatch floor, not the kernel (see bench_mlp_kernel.py)
    reps = int(os.environ.get("SABER_BENCH_REPS", "50"))

    @jax.jit
    def chained(v):
        return jax.lax.fori_loop(0, reps, lambda i, t: call(t), v)

    np.asarray(chained(x)[:1, :1, :1])
    t0 = time.perf_counter()
    np.asarray(chained(x)[:1, :1, :1])
    dt_s = (time.perf_counter() - t0) / reps
    tokens = b * side * side
    flops = 8 * tokens * c * c + 4 * tokens * window * window * c
    print(f"{dt_s * 1e3:.3f} ms/call  {flops / dt_s / 1e12:.1f} TFLOP/s "
          f"(needed-FLOPs basis)")


if __name__ == "__main__":
    main()
