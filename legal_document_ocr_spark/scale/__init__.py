from .dedup_compute import dedup_compute  # noqa: F401
from .salt import ensure_parallelism, salted_repartition, with_skew_keys  # noqa: F401
from .checkpoint import CheckpointStore  # noqa: F401
