"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 + the training-data curation ops); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for every SQL-expressible query (same column
names, same rounding). Ray is initialised by the driver BEFORE this
module is imported — nothing here calls ``ray.init()`` /
``ray.shutdown()``.

The board itself lives in ``pypdfium2_ray/queries/`` (split by family —
common / extraction / textstats / dedup / similarity / relational /
multimodal / board — round-4 housekeeping of what used to be a single
10k-line file; every query and oracle body is unchanged). This file
stays the stable driver entry point.
"""

from __future__ import annotations

from pypdfium2_ray.queries.board import (  # noqa: F401
    entry, oracle_sql, queries)
