from .pages import (  # noqa: F401
    PAGES_SCHEMA,
    fixture_rows,
    fixture_pages_df,
    synthesize_pages_df,
)
from .sink import read_partition, write_partitioned  # noqa: F401
