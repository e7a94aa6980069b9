from .dedup_compute import dedup_compute  # noqa: F401
from .salt import salted_repartition, with_skew_keys  # noqa: F401
from .checkpoint import CheckpointStore  # noqa: F401
