"""As-of join — an operator Ray Data lacks (custom-op path (a) of the
build brief: composition of union + one hash exchange + a per-partition
vectorized kernel).

For each left row, attach the single right row with the greatest
``on``-value satisfying ``right.on < left.on`` (backward direction;
``allow_exact`` makes it ``<=``), within the same ``by`` key.

Implementation: tag the two inputs, union them, hash-partition on ``by``
(``exchange.partition_map``) so each key's rows colocate, and run ONE
``pandas.merge_asof(by=...)`` per partition — the grouped as-of logic is
pandas' vectorized C path, with zero per-key Python calls (billions of
keys cost billions of interpreter calls under ``map_groups``).

Partitioning assumptions (documented per the brief):
- all rows of one ``by`` key fit in one worker's memory (true for
  per-user / per-entity streams; salt hot keys upstream if not);
- ``on`` is totally ordered within a key; ties on ``on`` in the right
  stream resolve to the last row in sort order (pandas semantics).
"""

from __future__ import annotations

import pandas as pd


def asof_join(left_ds, right_ds, by: str, on: str,
              right_suffix: str = "_right", allow_exact: bool = False,
              join_type: str = "inner"):
    """As-of join two Datasets. Returns left columns + right columns
    (right's ``by``/``on`` dropped, others suffixed on collision).

    ``join_type``: "inner" drops left rows with no earlier right row;
    "left" keeps them with nulls.
    """
    import pyarrow as pa

    def _arrow_schema(ds):
        s = ds.schema()
        return getattr(s, "base_schema", s)

    ls, rs = _arrow_schema(left_ds), _arrow_schema(right_ds)
    # unified schema: left fields, then right-only fields, then the tag —
    # each side pads the other's columns with typed nulls so union schemas
    # match exactly (Dataset.union requires identical schemas)
    fields = list(ls) + [f for f in rs if f.name not in ls.names]
    unified = pa.schema(fields + [pa.field("__side", pa.int8())])

    def tag(side):
        def f(t: pa.Table) -> pa.Table:
            cols = []
            for f_ in unified:
                if f_.name == "__side":
                    cols.append(pa.array([side] * t.num_rows, pa.int8()))
                elif f_.name in t.column_names:
                    cols.append(t[f_.name].cast(f_.type))
                else:
                    cols.append(pa.nulls(t.num_rows, f_.type))
            return pa.table(dict(zip(unified.names, cols)))
        return f

    tagged = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow"))

    left_cols = list(ls.names)
    right_cols = list(rs.names)
    # right integer payload columns: restore after the merge (a left join's
    # unmatched rows introduce NaN, which pandas widens to float64)
    right_int_cols = [f.name for f in rs
                     if f.name not in (by, on) and pa.types.is_integer(f.type)]

    def per_partition(g: "pa.Table") -> pd.DataFrame:
        # whole hash partition (complete keys); each SIDE is converted to
        # pandas separately so its own columns are null-free and integer
        # dtypes survive (a joint conversion would see the pad-nulls of the
        # other side and widen int64 ids to lossy float64)
        import pyarrow.compute as _pc
        left = g.filter(_pc.equal(g["__side"], 0)).select(left_cols) \
                .to_pandas().sort_values(on, kind="mergesort")
        right = g.filter(_pc.equal(g["__side"], 1)).select(right_cols) \
                 .to_pandas().sort_values(on, kind="mergesort") \
                 .assign(__matched=True)
        # nullable Int64 BEFORE the merge: unmatched left rows produce
        # pd.NA, never a lossy float64 widening (int64 ids > 2^53 survive)
        for c in right_int_cols:
            right[c] = right[c].astype("Int64")
        # one vectorized grouped as-of over the whole partition
        out = pd.merge_asof(left, right, on=on, by=by,
                            direction="backward",
                            allow_exact_matches=allow_exact,
                            suffixes=("", right_suffix))
        if join_type == "inner":
            out = out[out["__matched"].notna()]
        return out.drop(columns="__matched")

    from pypdfium2_ray.stages.exchange import partition_map
    return partition_map(tagged, [by], per_partition)
