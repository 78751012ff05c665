"""Capture + summarize a device trace of the one-program AMG generate.

Same xplane method as profile_direction.py, scoped to the
AutomaticMaskGenerator sweep so per-op shares attribute the ~2 s warm
device time (docs/benchmarks.md round-3 AMG findings) between encoder,
grid decode, m2m, stability scoring, and finalize.

    SABER_BENCH_CFG=base SABER_K=256 python tools/profile_amg.py
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

    from saber_tpu.adapters.sam2_adapter import SAM2Adapter
    from saber_tpu.config import AMGConfig, SAM2AdapterConfig

    on_tpu = jax.default_backend() == "tpu"
    cfg_name = os.environ.get("SABER_BENCH_CFG", "base")
    image_size = int(os.environ.get("SABER_BENCH_IMAGE", "1024"))
    k = int(os.environ.get("SABER_K", "256"))
    topk = int(os.environ.get("SABER_TOPK", "40"))
    logdir = os.environ.get("SABER_TRACE_DIR", "/tmp/saber_amg_trace")
    if not on_tpu:
        cfg_name, image_size, k = "tiny", 128, 8

    amg = AMGConfig(sam2_cfg=cfg_name, max_masks=k)
    ad = SAM2Adapter(SAM2AdapterConfig(
        cfg=cfg_name, image_size=image_size, amg_cfg=amg,
        dtype="bfloat16" if on_tpu else "float32"))
    rng = np.random.default_rng(0)
    img = (rng.standard_normal((image_size, image_size))
           .astype(np.float32) * 4 + 100)

    def once():
        return ad.segment_image_2d(img)

    t0 = time.perf_counter()
    once()
    print(f"first call: {time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    once()
    print(f"warm: {time.perf_counter() - t0:.2f} s", flush=True)

    jax.profiler.start_trace(logdir)
    once()
    jax.profiler.stop_trace()
    summarize_xplane(logdir, topk)


if __name__ == "__main__":
    main()
