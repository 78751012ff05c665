"""Capture + summarize a device trace of the fused direction program.

Builds the flagship config (hiera-large 1024 bf16), warms the one-program
direction dispatch on a small device volume, traces one dispatch, then
parses the xplane protobuf (tensorflow is available in this image) and
prints the top ops by accumulated device time — the round-2/3 method for
finding where the encoder+track+paint pipeline actually spends its time.

    python tools/profile_direction.py

Env: SABER_BENCH_CFG (large), SABER_BENCH_IMAGE (1024),
SABER_PROF_FRAMES (33: one seed + two 16-frame chunks), SABER_TOPK (40).
"""

import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_xplane(logdir: str, topk: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane found under", logdir)
        return
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    def categorize(name):
        """Bucket an HLO op name for share accounting.

        Async copy/slice-start spans run until their -done event and
        overlap real compute, so they get their own (non-compute) bucket.
        """
        n = name.split(" = ")[0].lstrip("%")
        if n.startswith(("copy-start", "slice-start", "copy-done",
                         "slice-done", "all-reduce-start")):
            return "async-copy (overlaps compute)"
        if n.startswith(("while", "conditional")):
            # control-flow wrapper events SUBSUME their body ops' time
            # (measured: whiles = 1419 ms of a 1046 ms dispatch) — keep
            # them out of the compute denominator or every share is ~2×
            # understated
            return "control-flow wrapper (subsumes body; overlaps)"
        for key in ("fused_window_attention", "fused_mlp", "flash_attention",
                    "fused_rope_attention"):
            if key in name:
                return key
        if "custom-call" in name:
            return "custom-call (other pallas)"
        if n.startswith(("convolution", "cudnn", "dot")):
            return "conv/dot"
        if ".fusion" in name or n.startswith(("fusion", "loop_fusion",
                                              "input_fusion", "output_fusion",
                                              "wide.windowed", "scatter",
                                              "reduce")):
            return "xla-fusion (elementwise/reduce/LN)"
        if n.startswith(("copy", "bitcast", "transpose", "reshape", "slice",
                         "concatenate", "dynamic")):
            return "layout copies"
        return "other"

    for plane in xspace.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        meta = {m.id: m for m in plane.event_metadata.values()}
        # prefer the XLA Ops line when present — other lines (modules,
        # steps) span whole programs and double-count everything
        lines = [ln for ln in plane.lines if "XLA Ops" in ln.name] \
            or list(plane.lines)
        tot = defaultdict(float)
        cnt = defaultdict(int)
        cat = defaultdict(float)
        for line in lines:
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta \
                    else str(ev.metadata_id)
                ms = ev.duration_ps / 1e9
                tot[name] += ms
                cnt[name] += 1
                cat[categorize(name)] += ms
        if not tot:
            continue
        compute = sum(ms for c, ms in cat.items() if "overlap" not in c
                      and "subsumes" not in c)
        print(f"\n== plane: {plane.name}  lines={len(lines)} "
              f"(compute-category sum {compute:.1f} ms)")
        for c, ms in sorted(cat.items(), key=lambda kv: -kv[1]):
            share = 100.0 * ms / compute if "overlap" not in c else 0.0
            tag = f"{share:5.1f}%" if "overlap" not in c else "  --  "
            print(f"  [{tag}] {ms:9.2f} ms  {c}")
        print()
        for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:topk]:
            print(f"  {ms:9.2f} ms  x{cnt[name]:<5d}  "
                  f"({categorize(name)})  {name[:96]}")
        # per-category detail for the glue buckets the overall top-K
        # (dominated by overlapped async copies) never reaches
        for want in ("xla-fusion (elementwise/reduce/LN)", "layout copies",
                     "conv/dot", "other"):
            rows = [(ms, name) for name, ms in tot.items()
                    if categorize(name) == want]
            rows.sort(reverse=True)
            print(f"\n  -- top {want} --")
            for ms, name in rows[:12]:
                print(f"  {ms:9.2f} ms  x{cnt[name]:<5d}  {name[:140]}")


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/saber_tpu/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from saber_tpu.adapters.sam2_adapter import SAM2Adapter
    from saber_tpu.config import SAM2AdapterConfig

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg_name = os.environ.get("SABER_BENCH_CFG", "large")
    image_size = int(os.environ.get("SABER_BENCH_IMAGE", "1024"))
    frames = int(os.environ.get("SABER_PROF_FRAMES", "33"))
    side = image_size // 2
    topk = int(os.environ.get("SABER_TOPK", "40"))
    logdir = os.environ.get("SABER_TRACE_DIR", "/tmp/saber_dir_trace")
    if not on_tpu:
        cfg_name, image_size, side, frames = "tiny", 128, 64, 9

    ad = SAM2Adapter(SAM2AdapterConfig(
        cfg=cfg_name, image_size=image_size,
        dtype="bfloat16" if on_tpu else "float32"))
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((frames, side, side)).astype(np.float32) * 0.1
    q = side // 4
    vol[:, q:3 * q, q:3 * q] += 2.0
    ad.set_volume(jnp.asarray(vol))

    seed = np.zeros((4, side, side), np.float32)  # 4 objects (bench shape)
    for i in range(4):
        seed[i, q + 8 * i:q + 8 * i + 16, q:q + 16] = 1.0
    state = ad.inference_state
    for i in range(4):
        ad.add_new_mask(0, i + 1, seed[i])
    pstate, _, _ = ad._seed_state(state, 0)
    order = np.arange(1, frames)

    def once():
        labels, scores = ad._dispatch_direction(state, pstate, order, 1.0,
                                                float(frames))
        np.asarray(scores)          # force
        return labels

    once()                          # compile + warm
    t0 = time.perf_counter()
    once()
    warm = time.perf_counter() - t0
    print(f"warm direction dispatch: {warm:.2f} s for {len(order)} slices "
          f"({len(order) / warm:.1f} slices/s)", flush=True)

    jax.profiler.start_trace(logdir)
    once()
    jax.profiler.stop_trace()
    summarize_xplane(logdir, topk)


if __name__ == "__main__":
    main()
