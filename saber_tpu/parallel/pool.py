"""Per-device task farm: the reference GPUPool's TPU-native successor.

The reference (saber/utils/parallelization.py:15-445) farms independent
runs (tomograms/micrographs) over GPUs with per-GPU model replicas,
threading or multiprocessing, round-robin assignment, and per-task
success/error/time records. Here:

- one process drives all local TPU chips; ``jax.default_device`` pins each
  worker's model replica and compute to its chip, so N chips process N
  runs concurrently (XLA dispatch is async; threads overlap host work)
- task records and the summary keep the reference's schema
  (parallelization.py:121-135, 382-411) so batch workflows and reporting
  port unchanged
- no manual cache management (no empty_cache analog needed)

``device_map`` is the functional convenience wrapper (the reference's
``gpu_map``, whose argument-order bug — parallelization.py:470,
SURVEY.md §6b — is fixed here).
"""

import threading
import time
import traceback
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax


class DevicePool:
    """Farm independent tasks over local accelerator chips."""

    def __init__(self, init_fn: Optional[Callable[[int], Dict[str, Any]]] = None,
                 num_devices: Optional[int] = None,
                 approach: str = "threading", verbose: bool = False,
                 max_retries: int = 0):
        """
        Args:
            init_fn: called once per device (under that device's context)
                returning a ``models`` dict handed to every task on it
                (reference loaders pattern, segmenters/loaders.py:9-65).
            num_devices: cap on devices used (default: all local).
            approach: "threading" (single process, per-chip threads). The
                reference's "multiprocessing" mode exists to isolate CUDA
                contexts; one JAX process already owns all chips, so it is
                accepted and treated as threading.
            max_retries: failed tasks retry up to this many times (on the
                next device in round-robin order) — the reference has no
                retry support (SURVEY.md §5 failure detection).
        """
        self.max_retries = max_retries
        self.devices = jax.local_devices()
        if num_devices is not None:
            self.devices = self.devices[:num_devices]
        self.num_devices = len(self.devices)
        self.verbose = verbose
        self.approach = approach

        self._locks = [threading.RLock() for _ in self.devices]
        self._models: List[Optional[Dict[str, Any]]] = [None] * self.num_devices
        self._init_errors: List[Optional[str]] = [None] * self.num_devices
        if init_fn is not None:
            for i, dev in enumerate(self.devices):
                try:
                    t0 = time.perf_counter()
                    with jax.default_device(dev):
                        self._models[i] = init_fn(i)
                    if verbose:
                        print(f"[DevicePool] device {i} init in "
                              f"{time.perf_counter() - t0:.1f}s")
                except Exception as e:  # INIT_FAILED sentinel analog (:270-276)
                    self._init_errors[i] = f"{type(e).__name__}: {e}"
                    if verbose:
                        traceback.print_exc()

    def _run_one(self, task_idx: int, task, fn, device_idx: int) -> Dict[str, Any]:
        record: Dict[str, Any] = {
            "task_id": task_idx, "device_id": device_idx,
            "success": False, "error": None, "result": None,
            "processing_time": 0.0,
        }
        if self._init_errors[device_idx] is not None:
            record["error"] = f"INIT_FAILED: {self._init_errors[device_idx]}"
            return record
        t0 = time.perf_counter()
        try:
            with self._locks[device_idx], jax.default_device(self.devices[device_idx]):
                kwargs = {}
                models = self._models[device_idx]
                if models is not None:
                    kwargs["models"] = models
                result = fn(task, device_id=device_idx, **kwargs) \
                    if models is not None else fn(task, device_id=device_idx)
                record["result"] = result
                record["success"] = True
        except Exception as e:
            record["error"] = f"{type(e).__name__}: {e}"
            if self.verbose:
                traceback.print_exc()
        record["processing_time"] = time.perf_counter() - t0
        return record

    def execute(self, fn: Callable, tasks: Sequence[Any]) -> Dict[str, Any]:
        """Run fn over tasks, round-robin across devices.

        fn signature: fn(task, device_id=..., models=...) (models only when
        an init_fn was given). Returns {"results": [records...],
        "summary": {...}} with the reference's record schema.
        """
        def run_with_retries(i, task):
            rec = self._run_one(i, task, fn, i % self.num_devices)
            attempt = 0
            while not rec["success"] and attempt < self.max_retries:
                attempt += 1
                rec = self._run_one(i, task, fn,
                                    (i + attempt) % self.num_devices)
                rec["retries"] = attempt
            return rec

        records: List[Optional[Dict[str, Any]]] = [None] * len(tasks)
        with ThreadPoolExecutor(max_workers=self.num_devices) as ex:
            futures = {
                ex.submit(run_with_retries, i, task): i
                for i, task in enumerate(tasks)}
            for fut in futures:
                records[futures[fut]] = fut.result()

        per_device: Dict[int, Dict[str, Any]] = {}
        for r in records:
            d = per_device.setdefault(r["device_id"],
                                      {"count": 0, "failures": 0, "total_time": 0.0})
            d["count"] += 1
            d["total_time"] += r["processing_time"]
            if not r["success"]:
                d["failures"] += 1
        for d in per_device.values():
            d["avg_time"] = d["total_time"] / max(d["count"], 1)

        failures = [r for r in records if not r["success"]]
        if self.verbose and failures:
            print(f"[DevicePool] {len(failures)}/{len(records)} tasks failed:")
            for r in failures:
                print(f"  task {r['task_id']}: {r['error']}")
        return {
            "results": records,
            "summary": {
                "total": len(records),
                "succeeded": len(records) - len(failures),
                "failed": len(failures),
                "per_device": per_device,
            },
        }


def device_map(fn: Callable, tasks: Sequence[Any],
               init_fn: Optional[Callable] = None,
               num_devices: Optional[int] = None,
               verbose: bool = False) -> List[Any]:
    """Map fn over tasks on all chips; return results in task order
    (working replacement for the reference's broken gpu_map)."""
    pool = DevicePool(init_fn=init_fn, num_devices=num_devices, verbose=verbose)
    out = pool.execute(fn, tasks)
    return [r["result"] for r in out["results"]]
