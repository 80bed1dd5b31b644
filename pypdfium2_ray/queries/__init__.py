"""Driver query board, split by family (round-4 housekeeping of the
10k-line ``__ray_entry__.py``; every query/oracle body is unchanged).

- ``common``      — shared constants + read/hint/cast helpers
- ``extraction``  — flagship extraction family
- ``textstats``   — text-analysis family
- ``dedup``       — dedup + link-graph families
- ``similarity``  — ANN / IVF / PQ / kmeans tiers
- ``relational``  — TPC-H-shaped relational surface
- ``multimodal``  — binary payloads through decode stages
- ``board``       — the driver-facing ``queries()`` / ``oracle_sql()``
"""

from pypdfium2_ray.queries.board import oracle_sql, queries  # noqa: F401
