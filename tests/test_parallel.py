"""DevicePool + mesh tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from saber_tpu.parallel import DevicePool, device_map, make_mesh, shard_batch
from saber_tpu.parallel.mesh import replicate


class TestDevicePool:
    def test_round_robin_and_records(self):
        pool = DevicePool(num_devices=4)
        out = pool.execute(lambda t, device_id: t * 2, list(range(10)))
        assert out["summary"]["total"] == 10
        assert out["summary"]["failed"] == 0
        results = [r["result"] for r in out["results"]]
        assert results == [t * 2 for t in range(10)]
        assert {r["device_id"] for r in out["results"]} == {0, 1, 2, 3}
        assert all(r["processing_time"] >= 0 for r in out["results"])

    def test_failure_isolation(self):
        pool = DevicePool(num_devices=2)

        def work(t, device_id):
            if t == 3:
                raise ValueError("boom")
            return t

        out = pool.execute(work, list(range(6)))
        assert out["summary"]["failed"] == 1
        bad = out["results"][3]
        assert not bad["success"] and "boom" in bad["error"]
        assert out["results"][4]["success"]  # batch continued

    def test_init_fn_models_injected(self):
        pool = DevicePool(init_fn=lambda i: {"scale": i + 1}, num_devices=2)
        out = pool.execute(lambda t, device_id, models: t * models["scale"],
                           [10, 10, 10, 10])
        vals = [r["result"] for r in out["results"]]
        assert vals == [10, 20, 10, 20]  # round robin over per-device models

    def test_init_failure_sentinel(self):
        def bad_init(i):
            if i == 1:
                raise RuntimeError("no weights")
            return {}

        pool = DevicePool(init_fn=bad_init, num_devices=2)
        out = pool.execute(lambda t, device_id, models: t, [1, 2])
        rec = out["results"][1]
        assert not rec["success"] and "INIT_FAILED" in rec["error"]

    def test_device_map(self):
        assert device_map(lambda t, device_id: t + 1, [1, 2, 3]) == [2, 3, 4]

    def test_compute_on_assigned_devices(self):
        pool = DevicePool(num_devices=4)

        def work(t, device_id):
            x = jnp.ones((8, 8)) * t
            return float(x.sum()), list(x.devices())[0].id

        out = pool.execute(work, list(range(8)))
        for r in out["results"]:
            val, dev = r["result"]
            assert dev == r["device_id"]


class TestMesh:
    def test_make_mesh_and_shard(self):
        mesh = make_mesh(8)
        batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
        sharded = shard_batch(mesh, batch)
        assert sharded["x"].sharding.num_devices == 8
        np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])

    def test_replicated_psum(self):
        mesh = make_mesh(4)
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = shard_batch(mesh, jnp.arange(8, dtype=jnp.float32))

        @jax.jit
        def total(v):
            return v.sum()

        assert float(total(x)) == 28.0  # cross-device reduction works

    def test_replicate(self):
        mesh = make_mesh(2)
        params = {"w": jnp.ones((4, 4))}
        rep = replicate(mesh, params)
        assert rep["w"].sharding.num_devices == 2

    def test_two_axis_mesh(self):
        mesh = make_mesh(8, axis_names=("data", "model"), shape=(4, 2))
        assert mesh.shape == {"data": 4, "model": 2}
        with pytest.raises(ValueError):
            make_mesh(8, axis_names=("a", "b"))


class TestRetries:
    def test_retry_succeeds_on_other_device(self):
        pool = DevicePool(num_devices=2, max_retries=2)
        calls = {}

        def flaky(t, device_id):
            calls[t] = calls.get(t, 0) + 1
            if t == 1 and calls[t] == 1:
                raise RuntimeError("transient")
            return t

        out = pool.execute(flaky, [0, 1, 2])
        assert out["summary"]["failed"] == 0
        assert out["results"][1]["retries"] == 1

    def test_permanent_failure_recorded(self):
        pool = DevicePool(num_devices=2, max_retries=1)

        def always_fail(t, device_id):
            raise ValueError("nope")

        out = pool.execute(always_fail, [0])
        assert out["summary"]["failed"] == 1
        assert "nope" in out["results"][0]["error"]


class TestMultiChipSingleVolume:
    """VERDICT round-1 item 4: one tomogram's work distributed over all
    devices with output identical to single-device
    (reference serial analogs: tomo.py:205-253, propagation.py:92-118)."""

    @pytest.fixture(scope="class")
    def volume(self):
        rng = np.random.default_rng(3)
        vol = rng.standard_normal((8, 64, 64)).astype(np.float32) * 0.1
        vol[2:7, 16:48, 16:48] += 2.0
        return vol

    @pytest.fixture(scope="class")
    def small_cfg(self):
        from saber_tpu.config import AMGConfig, SAM2AdapterConfig
        return SAM2AdapterConfig(
            cfg="tiny", image_size=64, dtype="float32", num_maskmem=2,
            amg_cfg=AMGConfig(npoints=4, points_per_batch=8,
                              pred_iou_thresh=0.05,
                              stability_score_thresh=0.0, crop_n_layers=0,
                              use_m2m=False, max_masks=8),
            min_mask_area=5)

    def test_parallel_slabs_match_serial(self, volume, small_cfg):
        from saber_tpu.segmenters.tomo import multiDepthTomoSegmenter
        seg = multiDepthTomoSegmenter(cfg=small_cfg, min_mask_area=5)
        seg.filter_threshold = 0.0   # random weights: don't presence-gate
        serial = seg.single_segment(volume, thickness=4, num_slabs=2,
                                    delta_z=2)
        parallel = seg.parallel_segment(volume, thickness=4, num_slabs=2,
                                        delta_z=2, num_devices=8)
        np.testing.assert_array_equal(serial, parallel)

    def test_mesh_sharded_encoding_matches_unsharded(self, volume, small_cfg):
        from saber_tpu.adapters.sam2_adapter import SAM2Adapter
        from saber_tpu.parallel.mesh import make_mesh

        mask = np.zeros((64, 64), np.float32)
        mask[16:48, 16:48] = 1

        ad = SAM2Adapter(small_cfg, encode_chunk=3)
        ad.set_volume(volume)
        ref = ad.segment_volume(4, masks=[mask], min_presence_score=0.0)

        ad2 = SAM2Adapter(small_cfg, encode_chunk=3)
        ad2.set_mesh(make_mesh(8))
        assert ad2.encode_chunk == 8  # rounded up to the mesh size
        ad2.set_volume(volume)
        out = ad2.segment_volume(4, masks=[mask], min_presence_score=0.0)

        # sharded z-slab encoding must not change the math
        np.testing.assert_array_equal(ref, out)
        assert out.max() >= 1
