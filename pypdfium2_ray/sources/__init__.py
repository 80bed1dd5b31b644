"""Sources: deterministic fixture corpus + Parquet readers (column-pruned)."""

from pypdfium2_ray.sources.fixtures import (  # noqa: F401
    CC_PAGES_SCHEMA, LOREM_LINES, LINK_LINES, fixture_rows, fixture_table,
    synthetic_rows, synthetic_table, write_cc_parquet,
)
