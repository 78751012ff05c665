from saber_tpu.adapters.base import BaseAdapter, get_adapter  # noqa: F401
from saber_tpu.config import (  # noqa: F401
    AdapterConfig,
    SAM2AdapterConfig,
    SAM3AdapterConfig,
)
