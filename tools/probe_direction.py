"""Isolate the fused direction program's device time from the host
postprocess inside segment_volume (TPU relay diagnostics).

Seeds once, then times: (a) one forward-direction dispatch + device sync,
(b) the label/score host transfers, (c) the LUT gate + nearest expand on
the host. Everything warm (second iteration reported).
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

    from saber_tpu.adapters.sam2_adapter import SAM2Adapter, _expand_labels
    from saber_tpu.config import SAM2AdapterConfig

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg_name = os.environ.get("SABER_BENCH_CFG", "large")
    depth = int(os.environ.get("SABER_BENCH_FRAMES", "512"))
    side = int(os.environ.get("SABER_BENCH_SIDE", "512"))
    image_size = int(os.environ.get("SABER_BENCH_IMAGE", "1024"))
    if not on_tpu:
        cfg_name, depth, side, image_size = "tiny", 16, 64, 128

    ad = SAM2Adapter(SAM2AdapterConfig(
        cfg=cfg_name, image_size=image_size,
        dtype="bfloat16" if on_tpu else "float32"))
    rng = np.random.default_rng(0)
    # build on host in chunks (this host's RNG is ~200 s for 512³ at once)
    vol = np.empty((depth, side, side), np.float32)
    for z in range(0, depth, 64):
        vol[z:z + 64] = rng.standard_normal((min(64, depth - z), side, side),
                                            dtype=np.float32) * 0.1
    q = side // 4
    vol[depth // 4:3 * depth // 4, q:3 * q, q:3 * q] += 2.0
    ad.set_volume(jnp.asarray(vol))

    seed = np.zeros((1, side, side), np.float32)
    seed[0, q:3 * q, q:3 * q] = 1.0
    state = ad.inference_state
    ad.add_new_mask(depth // 2, 1, seed[0])
    t0 = time.perf_counter()
    pstate, obj_ids, seed_logits = ad._seed_state(state, depth // 2)
    np.asarray(seed_logits[..., :1])
    print(f"seed (incl first-call): {time.perf_counter() - t0:.2f} s",
          flush=True)

    order = np.arange(depth // 2 + 1, depth)
    for it in range(2):
        t0 = time.perf_counter()
        labels, scores = ad._dispatch_direction(state, pstate, order, 1.0,
                                                float(depth))
        labels.block_until_ready()
        np.asarray(labels[..., :1, :1])      # force (relay-safe)
        t1 = time.perf_counter()
        lab_np = np.asarray(labels)
        sc_np = np.asarray(scores)
        t2 = time.perf_counter()
        lowlab = np.zeros((depth, labels.shape[1], labels.shape[2]),
                          np.uint16)
        lowlab[order] = lab_np[:len(order)]
        lut = np.tile(np.arange(2, dtype=lowlab.dtype), (depth, 1))
        gated = lut[np.arange(depth)[:, None, None], lowlab]
        out = _expand_labels(gated, side, side)
        t3 = time.perf_counter()
        tag = "warm" if it else "first"
        print(f"direction {tag}: device {t1 - t0:.2f} s, "
              f"transfer {t2 - t1:.2f} s ({lab_np.nbytes / 1e6:.1f} MB), "
              f"host gate+expand {t3 - t2:.2f} s "
              f"(out {out.nbytes / 1e6:.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
