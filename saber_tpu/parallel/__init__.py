from saber_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: F401
from saber_tpu.parallel.pool import DevicePool, device_map  # noqa: F401
