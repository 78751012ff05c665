"""On-chip equivalence check: fused-RoPE memory attention vs external
rotation (SABER_FUSED_ROPE=1 vs 0), same params/inputs.

The fused path now folds the de-interleave channel permutation into the
q/k projection WEIGHTS (models/memory.py RoPEAttention); a column
permutation of a GEMM is exact, and the kernel-level rotation already has
a CPU golden (tests/test_flash_attention.py::test_fused_rope_matches_
external_rotation), so the two paths must agree to bf16 rounding.

    python tools/check_fused_rope.py     # on the TPU relay
"""

import os
import sys

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

    from saber_tpu.models.memory import MemoryAttention

    if jax.default_backend() in ("cpu",):
        print("needs the TPU backend (the fused path gates on it); skipping")
        return

    b, t, s_mem, n_ptr, d, md = 2, 4096, 2 * 4096 + 64, 64, 256, 64
    m = MemoryAttention(d_model=d, num_layers=2, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    curr = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    mem = jnp.asarray(rng.standard_normal((b, s_mem, md)).astype(np.float32))
    curr_pos = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32)) * 0.1
    mem_pos = jnp.asarray(rng.standard_normal((b, s_mem, md)).astype(np.float32)) * 0.1

    # n_ptr must stay a static python int (tile reps) — close over it
    params = jax.jit(lambda r_, c, me, cp, mp: m.init(r_, c, me, cp, mp,
                                                      n_ptr))(
        jax.random.PRNGKey(0), curr, mem, curr_pos, mem_pos)["params"]

    outs = {}
    for flag in ("0", "1"):
        os.environ["SABER_FUSED_ROPE"] = flag

        def f(p, c, me, cp, mp):
            return m.apply({"params": p}, c, me, cp, mp, n_ptr)

        out = jax.jit(f)(params, curr, mem, curr_pos, mem_pos)
        outs[flag] = np.asarray(out, np.float32)
        print(f"SABER_FUSED_ROPE={flag}: out mean {outs[flag].mean():+.5f} "
              f"std {outs[flag].std():.5f}", flush=True)

    diff = np.abs(outs["0"] - outs["1"])
    scale = np.abs(outs["0"]).mean()
    print(f"max abs diff {diff.max():.5f}, mean {diff.mean():.6f}, "
          f"|out| mean {scale:.5f}")
    assert diff.max() < 0.12 and diff.mean() < 0.01 * max(scale, 1.0), \
        "fused-RoPE path diverged from external rotation"
    print("fused-rope equivalence PASS")


if __name__ == "__main__":
    main()
