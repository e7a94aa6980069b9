from .inspect import (  # noqa: F401
    count_exchanges,
    executed_plan,
    has_broadcast_join,
    pushed_filters,
)
