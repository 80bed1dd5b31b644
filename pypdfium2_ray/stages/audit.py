"""Plan auditing: count the wide (shuffle) operators a Dataset will
execute BEFORE running it.

Every stage in this repo documents its exchange budget ("ONE hash
exchange on the key", "zero exchanges") because at 100 TB the exchange
count IS the cost model — each keyed repartition is an all-to-all move
of its input. Prose contracts rot; this module makes them testable:
``exchange_budget(ds)`` walks the Dataset's logical plan and counts the
wide operators by kind, and ``tests/test_audit.py`` pins the documented
budget of each operator family. A regression that sneaks a second
shuffle into a one-exchange op now fails a test instead of surviving
until someone reads ``ds.stats()`` at scale.

Caveat: ``materialize()`` truncates lineage (the plan restarts from the
materialized blocks), so budgets are per lineage segment — ops that
deliberately materialize a small intermediate (the semi-join prefilter,
the delta split) audit the segments separately.
"""

from __future__ import annotations


def exchange_budget(ds) -> dict[str, int]:
    """``{"hash_exchanges": n, "unkeyed_repartitions": n, "sorts": n,
    "aggregates": n}`` for the Dataset's logical plan — keyed
    repartitions are the hash exchanges this repo's stages use; sorts /
    native aggregates would be Ray Data's sort-based wide ops (this
    repo's stages use none; a nonzero count is a red flag)."""
    out = {"hash_exchanges": 0, "unkeyed_repartitions": 0,
           "sorts": 0, "aggregates": 0}
    stack = [ds._logical_plan.dag]
    seen = set()
    while stack:
        node = stack.pop()
        if id(node) in seen:
            continue
        seen.add(id(node))
        kind = type(node).__name__
        if kind == "Repartition":
            if getattr(node, "_keys", None):
                out["hash_exchanges"] += 1
            else:
                out["unkeyed_repartitions"] += 1
        elif kind == "Sort":
            out["sorts"] += 1
        elif kind == "Aggregate":
            out["aggregates"] += 1
        stack.extend(node.input_dependencies)
    return out


def count_exchanges(ds) -> int:
    """Shorthand: the hash-exchange count alone."""
    return exchange_budget(ds)["hash_exchanges"]
