"""Gap-based sessionization — per-key ordered stateful computation.

Assign each event a session id that increments whenever the gap to the
user's previous event exceeds ``gap``: the classic clickstream session
operator (no reference analogue; SURVEY §2.9 noted the reference has no
streaming concepts — this is the batch form every telemetry pipeline
needs).

Plan: one hash exchange (``exchange.partition_map`` on *key*) colocates
each key's events; the whole partition is then processed by ONE
vectorized kernel (sort by (key, ts), diff + cumsum with key-boundary
reset — no per-group Python calls, which at billions of users would be
billions of interpreter calls under ``map_groups``). Same partitioning
assumption as the as-of join: one key's events fit one worker.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def sessionize(ds, key: str = "user_id", ts_col: str = "ts",
               gap_s: float = 1800.0, out_col: str = "session_id",
               num_partitions: int | None = None):
    """Append ``out_col``: 0-based session index per *key*, new session when
    the time since the previous event exceeds ``gap_s`` seconds."""
    from pypdfium2_ray.stages.exchange import partition_map
    gap = pd.Timedelta(seconds=gap_s)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort")
        # vectorized over the whole partition: a "new session" is a gap
        # break within a key; the first row of each key always starts
        # session 0 (key-boundary rows are masked out of the gap test)
        same_key = df[key].eq(df[key].shift())
        new_session = (df[ts_col].diff() > gap) & same_key
        df[out_col] = new_session.groupby(df[key].values).cumsum() \
                                 .astype("int64")
        return df

    return partition_map(ds, [key], per_partition, batch_format="pandas",
                         num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# cohort retention

def cohort_retention(ds, user_col: str = "user_id", ts_col: str = "ts",
                     bucket_us: int = 86_400_000_000,
                     num_partitions: int | None = None):
    """Cohort-retention matrix: bucket events into days (``bucket_us``),
    cohort = each user's first-seen day, cell = exact distinct active
    users per ``(cohort_day, day_offset)``.

    Shape: day bucketing is one vectorized cast pass; first-seen is a
    ``grouped_aggregate`` min on ids-only ``(user, day)`` rows; the
    cohort day comes back via a repartition ``lookup_join`` keyed on the
    user (large x large — the first-seen side ships two ints per user);
    the matrix is ``freq.grouped_distinct_count`` (pre-combined distinct,
    one pair exchange, exact). Integer arithmetic end to end.
    """
    import pyarrow.compute as pc

    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import lookup_join
    from pypdfium2_ray.stages.freq import grouped_distinct_count

    def to_day(t: pa.Table) -> pa.Table:
        us = t[ts_col].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64())
        day = pc.divide(us, bucket_us)       # ts >= epoch: trunc == floor
        return pa.table({user_col: pc.cast(t[user_col], pa.int64()),
                         "day": day})

    days = ds.map_batches(to_day, batch_format="pyarrow")
    firsts = grouped_aggregate(days, [user_col],
                               {"cohort_day": ("day", "min")},
                               num_partitions=num_partitions)
    joined = lookup_join(
        days, {user_col: pa.int64(), "day": pa.int64()},
        firsts, source_key=user_col, key_col=user_col,
        payload_cols={"cohort_day": pa.int64()},
        num_partitions=num_partitions)

    def offset(t: pa.Table) -> pa.Table:
        return t.append_column(
            "day_offset", pc.subtract(t["day"], t["cohort_day"])) \
            .drop_columns(["day"])

    cells = joined.map_batches(offset, batch_format="pyarrow")
    return grouped_distinct_count(cells, ["cohort_day", "day_offset"],
                                  user_col, out="n_users",
                                  num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# consecutive-duplicate run collapse

def collapse_repeats(ds, key: str = "user_id", ts_col: str = "ts",
                     val_col: str = "event_type", id_col: str = "event_id",
                     num_partitions: int | None = None):
    """Collapse each per-key RUN of consecutive equal ``val_col`` events
    (ordered by ``(ts, id)``) into one row — the telemetry compaction
    pass that removes retry storms / double-fires / held-down-key spam
    before sessionization or funnel analysis (the streaming-world
    "deduplicate consecutive" primitive, batch form; the classic
    gaps-and-islands problem, which is how the SQL twin states it).

    Output per run: ``(key, val, run_len, first_ts, min_event_id)``.
    The last two are MIN-aggregates over the run (well-defined under
    any tie order), not "fields of the first row", so the result is a
    pure function of the input set.

    Plan: ONE hash exchange on *key* (``exchange.partition_map``), then
    one whole-partition vectorized kernel — mergesort by (key, ts, id),
    boundary mask via shifted equality, run ids by cumsum, one Cython
    ``groupby.agg`` (size + two mins). No per-group Python; same
    one-key-fits-one-worker partitioning contract as :func:`sessionize`.
    """
    from pypdfium2_ray.stages.exchange import partition_map

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, id_col], kind="mergesort")
        same = (df[key].eq(df[key].shift())
                & df[val_col].eq(df[val_col].shift()))
        run = (~same).cumsum()
        g = df.groupby(run.values, sort=False)
        out = pd.DataFrame({
            key: g[key].first(),
            val_col: g[val_col].first(),
            "run_len": g[ts_col].size().astype("int64"),
            "first_ts": g[ts_col].min(),
            "min_event_id": g[id_col].min().astype("int64"),
        })
        return out.reset_index(drop=True)

    return partition_map(ds, [key], per_partition, batch_format="pandas",
                         num_partitions=num_partitions)


def gap_stats(ds, key_col: str = "user_id", ts_col: str = "ts",
              num_partitions: int | None = None):
    """Per-key inter-arrival-time statistics: ``(key, n_gaps,
    min_gap_us, max_gap_us, sum_gap_us)`` over the gaps between
    consecutive events in timestamp order — the lead/lag window family
    as a batch aggregate (bot-cadence / burstiness features). Keys with
    a single event emit nothing (no gaps), matching the twin's ``WHERE
    gap IS NOT NULL``. Gaps stay integer microseconds end-to-end; the
    gap sequence is a pure function of each key's timestamp MULTISET
    (equal-ts ties diff to zero under any tie order). ONE hash
    exchange, whole-partition vectorized kernel: lexsort, diff,
    key-boundary mask, one Cython groupby agg."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key_col: pd.Series([], dtype=(df[key_col].dtype
                                     if key_col in df else "int64")),
                                 "n_gaps": pd.Series([], dtype="int64"),
                                 "min_gap_us": pd.Series([], dtype="int64"),
                                 "max_gap_us": pd.Series([], dtype="int64"),
                                 "sum_gap_us": pd.Series([], dtype="int64")})
        key = df[key_col].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        order = np.lexsort((us, key))
        key, us = key[order], us[order]
        d = np.diff(us)
        same = key[1:] == key[:-1]
        g = pd.DataFrame({key_col: key[1:][same], "gap": d[same]})
        agg = g.groupby(key_col, sort=False, as_index=False)["gap"] \
            .agg(n_gaps="count", min_gap_us="min", max_gap_us="max",
                 sum_gap_us="sum")
        for c in ("n_gaps", "min_gap_us", "max_gap_us", "sum_gap_us"):
            agg[c] = agg[c].astype("int64")
        return agg

    proj = ds.select_columns([key_col, ts_col])
    return partition_map(proj, [key_col], kernel, batch_format="pandas",
                         num_partitions=num_partitions)


def transition_counts(ds, key_col: str = "user_id", ts_col: str = "ts",
                      label_col: str = "event_type",
                      tiebreak: str = "event_id",
                      num_partitions: int | None = None):
    """Markov transition counts over per-key ordered event streams:
    ``(prev_label, next_label, n)`` summed across all keys — the
    sequence-mining aggregate behind next-action models and
    session-flow dashboards (funnel checks ONE fixed pattern; this
    counts every adjacent pair). Order within a key is (ts, tiebreak).

    ONE hash exchange on the key; the kernel lexsorts the partition,
    masks key boundaries, and counts pairs with a single Cython
    groupby — emitting per-partition PARTIAL counts. The final combine
    is single-block (label alphabets are enum-like: the pair space is
    |labels|^2 regardless of corpus size), so no second exchange."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"prev_type": pd.Series([], dtype="object"),
                                 "next_type": pd.Series([], dtype="object"),
                                 "__n": pd.Series([], dtype="int64")})
        key = df[key_col].to_numpy()
        ts = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        order = np.lexsort((tb, ts, key))
        key = key[order]
        lab = df[label_col].to_numpy()[order]
        same = key[1:] == key[:-1]
        pairs = pd.DataFrame({"prev_type": lab[:-1][same],
                              "next_type": lab[1:][same]})
        g = pairs.groupby(["prev_type", "next_type"], sort=False,
                          as_index=False).size()
        return g.rename(columns={"size": "__n"}).astype({"__n": "int64"})

    proj = ds.select_columns([key_col, ts_col, label_col, tiebreak])
    partials = partition_map(proj, [key_col], kernel,
                             batch_format="pandas",
                             num_partitions=num_partitions)
    return grouped_aggregate(partials, ["prev_type", "next_type"],
                             {"n": ("__n", "sum")},
                             combine="single_block")


def event_paths(ds, key: str = "user_id", order_cols=("ts", "event_id"),
                label_col: str = "event_type", sep: str = "->",
                out: str = "path"):
    """Ordered per-key journey strings: every key's labels concatenated
    in ``order_cols`` order — the user-path / clickstream-trace op
    (``transition_counts`` aggregates adjacent pairs GLOBALLY; this
    materializes each key's full sequence, the input to path clustering
    and funnel discovery).

    ONE hash exchange on the key; the kernel is fully vectorized: one
    lexsort of the partition (key last => primary), then pyarrow
    ``group_by(key).aggregate([(label, "list")])`` — whose lists
    preserve encounter order, i.e. the sort order — joined by ONE
    ``pc.binary_join`` call. No per-key Python; output size equals the
    label payload, which rides a single exchange (a key's full journey
    must colocate — inherent to the op, not a plan defect).
    """
    import numpy as np

    from pypdfium2_ray.stages.exchange import partition_map
    cols = [key, *order_cols, label_col]

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if t.num_rows == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             out: pa.array([], pa.string())})
        arrs = [t[c].to_numpy(zero_copy_only=False)
                for c in (*reversed(order_cols), key)]
        order = np.lexsort(arrs)
        s = t.take(pa.array(order))
        g = s.group_by([key], use_threads=False).aggregate(
            [(label_col, "list"), ([], "count_all")])
        return pa.table({key: g[key],
                         "n_events": pc.cast(g["count_all"], pa.int64()),
                         out: pc.binary_join(g[f"{label_col}_list"], sep)})

    return partition_map(ds.select_columns(cols), [key], kernel)


def time_weighted_sum(ds, key: str = "user_id", ts_col: str = "ts",
                      tiebreak: str = "event_id",
                      value_col: str = "value_e4",
                      out: str = "integral_e4"):
    """Per-key time-weighted value integral: ``sum(dt_seconds x value)``
    over consecutive events in ``(ts, tiebreak)`` order, each interval
    weighted by its LEFT endpoint's value — the metering/billing
    aggregate (state held at v until the next change: usage-hours,
    position exposure, holding value). The last event of a key carries
    no interval; a single-event key integrates to 0.

    *value_col* is caller-pre-scaled int64 (the moments convention);
    dt is whole seconds (``us_diff // 1e6`` — nonneg after the sort, so
    floor == truncate on both engines) to keep ``dt x value`` sums in
    int64 range. ONE hash exchange; whole-partition vectorized kernel
    (lexsort, diff, boundary mask, one Cython groupby sum). Keys emit
    even when the integral is 0 (count rides along as ``n_events``).
    """
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                out: pd.Series([], dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        v = df[value_col].to_numpy().astype(np.int64)
        order = np.lexsort((tb, us, k))
        k, us, v = k[order], us[order], v[order]
        same = k[1:] == k[:-1]
        dt_s = (np.diff(us) // 1_000_000)
        contrib = np.where(same, dt_s * v[:-1], 0)
        g = pd.DataFrame({key: k,
                          "c": np.concatenate([contrib, [0]])})
        agg = g.groupby(key, sort=False, as_index=False)["c"] \
            .agg(n_events="count", **{out: "sum"})
        return agg.rename(columns={"c": out})[
            [key, "n_events", out]].astype(
            {"n_events": "int64", out: "int64"})

    return partition_map(ds.select_columns([key, ts_col, tiebreak,
                                            value_col]),
                         [key], kernel, batch_format="pandas")


def running_total(ds, key: str = "user_id", ts_col: str = "ts",
                  tiebreak: str = "event_id",
                  value_col: str = "value_e4",
                  out: str = "run_total_e4"):
    """Per-row running total: every input row annotated with the
    cumulative sum of *value_col* over its key's history in
    ``(ts, tiebreak)`` order — ``SUM(v) OVER (PARTITION BY key ORDER BY
    ts, tiebreak ROWS UNBOUNDED PRECEDING)``, the all-rows-out window
    function the rank/top-k family doesn't cover (balance-after-event,
    odometer, cumulative spend).

    ONE hash exchange; whole-partition vectorized kernel: lexsort by
    (key, ts, tiebreak), ONE global cumsum, then subtract each key run's
    starting offset (``np.repeat`` of the cumsum at run boundaries) —
    no per-group Python at any group count. *value_col* is caller-pre-
    scaled int64 (the moments convention), so partial sums are exact
    and the output hashes identically on any engine. Output is one row
    per input row: (tiebreak, key, out).
    """
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                tiebreak: pd.Series(dtype="int64"),
                key: pd.Series(dtype="int64"),
                out: pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        v = df[value_col].to_numpy().astype(np.int64)
        order = np.lexsort((tb, us, k))
        k, tb, v = k[order], tb[order], v[order]
        cs = np.cumsum(v)
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        counts = np.diff(np.append(starts, len(k)))
        base = np.repeat(cs[starts] - v[starts], counts)
        return pd.DataFrame({tiebreak: tb.astype("int64"),
                             key: k.astype("int64"),
                             out: (cs - base).astype("int64")})

    return partition_map(ds.select_columns([key, ts_col, tiebreak,
                                            value_col]),
                         [key], kernel, batch_format="pandas")


def running_peak(ds, key: str = "user_id", ts_col: str = "ts",
                 tiebreak: str = "event_id", value_col: str = "value_e4",
                 out: str = "peak_e4"):
    """Per-row high-watermark, all rows out: every event annotated with
    the MAX of its key's values up to and including it in ``(ts,
    tiebreak)`` order, plus an ``is_record`` flag marking STRICT new
    peaks (ties with the standing peak are not records; the first event
    of a key always is) — record-breaking detection, the
    ``MAX(v) OVER (ROWS UNBOUNDED PRECEDING)`` window shape
    (:func:`running_total`'s cumsum has a run-offset decomposition; max
    does not, so the kernel is one Cython ``groupby().cummax()`` — no
    per-group Python at any key count). *value_col* is caller-pre-
    scaled NONNEGATIVE int64 (the moments convention; -1 is the
    unreachable no-previous-peak sentinel the twin COALESCEs)."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                tiebreak: pd.Series(dtype="int64"),
                key: pd.Series(dtype="int64"),
                out: pd.Series(dtype="int64"),
                "is_record": pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        v = df[value_col].to_numpy().astype(np.int64)
        order = np.lexsort((tb, us, k))
        k, tb, v = k[order], tb[order], v[order]
        peak = pd.Series(v).groupby(k).cummax().to_numpy()
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        prev_peak = np.where(new_key, -1,
                             np.concatenate([[0], peak[:-1]]))
        return pd.DataFrame({tiebreak: tb.astype("int64"),
                             key: k.astype("int64"),
                             out: peak.astype("int64"),
                             "is_record": (v > prev_peak)
                             .astype("int64")})

    return partition_map(ds.select_columns([key, ts_col, tiebreak,
                                            value_col]),
                         [key], kernel, batch_format="pandas")


def event_islands(ds, key: str = "user_id", ts_col: str = "ts",
                  tiebreak: str = "event_id", label: str = "event_type"):
    """Gaps-and-islands: collapse each key's (ts, tiebreak)-ordered
    stream into maximal runs of equal *label* — the SCD2/state-interval
    builder ("user was in state X from t1 to t2"). One island row per
    run: (key, label, n_events, start_us, end_us, first_id) with
    timestamps as epoch-microsecond int64 (engine-neutral hashing) and
    ``first_id`` = MIN tiebreak in the run (matches the SQL
    row_number-difference twin's min()).

    ONE hash exchange; whole-partition vectorized kernel: lexsort by
    (key, ts, tiebreak), run boundaries where key OR label changes
    (two shifted compares), then np.*.reduceat per boundary for
    count/min/max — no per-group Python at any island count.
    """
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series(dtype="int64"),
                label: pd.Series(dtype="object"),
                "n_events": pd.Series(dtype="int64"),
                "start_us": pd.Series(dtype="int64"),
                "end_us": pd.Series(dtype="int64"),
                "first_id": pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        lab = df[label].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us, tb, lab = k[order], us[order], tb[order], lab[order]
        new = np.concatenate([[True], (k[1:] != k[:-1])
                              | (lab[1:] != lab[:-1])])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k))
        return pd.DataFrame({
            key: k[starts].astype("int64"),
            label: lab[starts],
            "n_events": (ends - starts).astype("int64"),
            # runs are ts-sorted: min ts = first, max ts = last
            "start_us": us[starts].astype("int64"),
            "end_us": us[ends - 1].astype("int64"),
            # ties can reorder ids inside one timestamp — true MIN
            "first_id": np.minimum.reduceat(tb, starts).astype("int64")})

    return partition_map(ds.select_columns([key, ts_col, tiebreak, label]),
                         [key], kernel, batch_format="pandas")


def group_centered(ds, key: str = "user_id", tiebreak: str = "event_id",
                   value_col: str = "value_e4"):
    """Group-mean-centered values, all rows out — the
    ``AVG(v) OVER (PARTITION BY key)`` window shape (aggregate joined
    back onto every row), kept integer-exact by emitting the SCALED
    deviation ``dev_n = v * n_key - sum_key`` plus ``n_key`` instead of
    a float z-score (the caller divides; both engines hash identically).

    ONE hash exchange; whole-partition kernel: two Cython groupby
    transforms (sum, size) — no sort needed, order within the key is
    irrelevant to the aggregate."""
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                tiebreak: pd.Series(dtype="int64"),
                key: pd.Series(dtype="int64"),
                "n_key": pd.Series(dtype="int64"),
                "dev_n": pd.Series(dtype="int64")})
        g = df.groupby(key, sort=False)[value_col]
        n = g.transform("size").to_numpy().astype("int64")
        s = g.transform("sum").to_numpy().astype("int64")
        v = df[value_col].to_numpy().astype("int64")
        return pd.DataFrame({tiebreak: df[tiebreak].to_numpy(),
                             key: df[key].to_numpy(),
                             "n_key": n, "dev_n": v * n - s})

    return partition_map(ds.select_columns([key, tiebreak, value_col]),
                         [key], kernel, batch_format="pandas")


#: event_lag's no-previous-event markers (first row of a key): real
#: NULLs never cross the driver hash gate, and -1 is unreachable for
#: both a nonnegative id and a nonnegative sorted time delta
LAG_NONE_ID = -1
LAG_NONE_DT = -1


def event_lag(ds, key: str = "user_id", ts_col: str = "ts",
              tiebreak: str = "event_id", value_col: str = "value_e4"):
    """All-rows LAG emit: every event annotated with its key's PREVIOUS
    event — (prev_id, dt_us since it, value delta vs it) — the
    row-level inter-arrival/delta stream that ``gap_stats`` aggregates
    away and ``event_transitions`` collapses to pair counts. First
    event of a key carries ``prev_id = dt_us = -1`` and ``dv = 0``
    (sentinels; COALESCE twin).

    ONE hash exchange; whole-partition vectorized kernel: lexsort by
    (key, ts, tiebreak), one shift, boundary mask — no per-group Python.
    dt is epoch-us difference (nonneg after the sort); *value_col* is
    caller-pre-scaled int64 so the delta hashes identically on any
    engine."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                tiebreak: pd.Series(dtype="int64"),
                key: pd.Series(dtype="int64"),
                "prev_id": pd.Series(dtype="int64"),
                "dt_us": pd.Series(dtype="int64"),
                "dv": pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        v = df[value_col].to_numpy().astype(np.int64)
        order = np.lexsort((tb, us, k))
        k, us, tb, v = k[order], us[order], tb[order], v[order]
        same = np.concatenate([[False], k[1:] == k[:-1]])
        prev_id = np.where(same, np.concatenate([[0], tb[:-1]]),
                           LAG_NONE_ID)
        dt = np.where(same, us - np.concatenate([[0], us[:-1]]),
                      LAG_NONE_DT)
        dv = np.where(same, v - np.concatenate([[0], v[:-1]]), 0)
        return pd.DataFrame({tiebreak: tb.astype("int64"),
                             key: k.astype("int64"),
                             "prev_id": prev_id.astype("int64"),
                             "dt_us": dt.astype("int64"),
                             "dv": dv.astype("int64")})

    return partition_map(ds.select_columns([key, ts_col, tiebreak,
                                            value_col]),
                         [key], kernel, batch_format="pandas")


def running_distinct(ds, key: str = "user_id", ts_col: str = "ts",
                     tiebreak: str = "event_id", label: str = "event_type",
                     out: str = "n_distinct"):
    """Running COUNT(DISTINCT label) per key, all rows out: each event
    annotated with how many distinct labels its key has seen UP TO AND
    INCLUDING it in ``(ts, tiebreak)`` order — the
    exploration/coverage curve ("how many product areas has this user
    touched by event t"). SQL's window COUNT(DISTINCT ... ) OVER is
    unsupported on most engines; the exact twin is
    ``SUM(is_first) OVER (ROWS UNBOUNDED PRECEDING)`` where is_first
    marks the label's first occurrence within the key (row_number = 1
    over (key, label)).

    ONE hash exchange; whole-partition vectorized kernel: lexsort by
    (key, label, ts, tiebreak) finds first occurrences (boundary mask —
    no hashing, no sets), then a second lexsort into time order and one
    per-key cumsum of the first-occurrence flags (run-boundary offset
    subtraction, the ``running_total`` kernel over a derived 0/1
    column). No per-group Python at any cardinality.
    """
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                tiebreak: pd.Series(dtype="int64"),
                key: pd.Series(dtype="int64"),
                out: pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        lab = df[label].to_numpy()
        # pass 1: first occurrence of (key, label) under time order —
        # lexsort with (key, label) major and time minor, boundary mask
        o1 = np.lexsort((tb, us, lab, k))
        k1, lab1 = k[o1], lab[o1]
        first = np.concatenate([[True], (k1[1:] != k1[:-1])
                                | (lab1[1:] != lab1[:-1])])
        flag = np.empty(len(k), np.int64)
        flag[o1] = first
        # pass 2: per-key cumsum of flags in time order
        o2 = np.lexsort((tb, us, k))
        k2, tb2, f2 = k[o2], tb[o2], flag[o2]
        cs = np.cumsum(f2)
        starts = np.flatnonzero(
            np.concatenate([[True], k2[1:] != k2[:-1]]))
        counts = np.diff(np.append(starts, len(k2)))
        base = np.repeat(cs[starts] - f2[starts], counts)
        return pd.DataFrame({tiebreak: tb2.astype("int64"),
                             key: k2.astype("int64"),
                             out: (cs - base).astype("int64")})

    return partition_map(ds.select_columns([key, ts_col, tiebreak, label]),
                         [key], kernel, batch_format="pandas")


def first_touch_attribution(ds, target: str, key: str = "user_id",
                            ts_col: str = "ts", tiebreak: str = "event_id",
                            label: str = "event_type",
                            gap_s: float = 1800.0):
    """Composed-window attribution in ONE exchange: every *target* event
    (the conversion) annotated with the FIRST label of ITS SESSION —
    first-touch marketing attribution, fusing sessionize (gap cut) +
    FIRST_VALUE OVER (session) + the conversion filter into a single
    per-partition kernel instead of three windowed passes.

    Kernel: lexsort by (key, ts, tiebreak); a session starts at a key
    boundary or a gap > *gap_s* (ties have dt 0 and can never split a
    session, so the cut is total-order-stable); the session-start row's
    label propagates by ``np.repeat`` over session run lengths; the
    filter keeps target rows. Output: (tiebreak, key, session_id,
    first_touch) — session_id is the key's 0-based session index,
    matching :func:`sessionize`."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    gap_us = int(gap_s * 1_000_000)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                tiebreak: pd.Series(dtype="int64"),
                key: pd.Series(dtype="int64"),
                "session_id": pd.Series(dtype="int64"),
                "first_touch": pd.Series(dtype="object")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        lab = df[label].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us, tb, lab = k[order], us[order], tb[order], lab[order]
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        new_sess = new_key | np.concatenate(
            [[True], (us[1:] - us[:-1]) > gap_us])
        starts = np.flatnonzero(new_sess)
        runs = np.diff(np.append(starts, len(k)))
        first_touch = np.repeat(lab[starts], runs)
        # 0-based session index per key: cumulative new-session count
        # minus the count at the key's start
        sess_cum = np.cumsum(new_sess) - 1
        key_starts = np.flatnonzero(new_key)
        key_runs = np.diff(np.append(key_starts, len(k)))
        sess_id = sess_cum - np.repeat(sess_cum[key_starts], key_runs)
        keep = lab == target
        return pd.DataFrame({tiebreak: tb[keep].astype("int64"),
                             key: k[keep].astype("int64"),
                             "session_id": sess_id[keep].astype("int64"),
                             "first_touch": first_touch[keep]})

    return partition_map(ds.select_columns([key, ts_col, tiebreak, label]),
                         [key], kernel, batch_format="pandas")


def last_touch_attribution(ds, target: str, key: str = "user_id",
                           ts_col: str = "ts", tiebreak: str = "event_id",
                           label: str = "event_type",
                           gap_s: float = 1800.0,
                           direct: str = "(direct)"):
    """Last-touch attribution in ONE exchange: every *target* event
    (the conversion) annotated with the label of the event IMMEDIATELY
    BEFORE it in the SAME session — "what was the final nudge". A
    conversion that OPENS its session has no in-session predecessor and
    carries the *direct* sentinel (the marketing "direct traffic"
    bucket; real NULLs never cross the driver hash gate). The mirror of
    :func:`first_touch_attribution` (entry touchpoint vs final one).

    Kernel: the shared session geometry (lexsort by ``(key, ts,
    tiebreak)``, gap-or-key boundary mask), one label shift gated by
    the session-start mask, then the conversion filter. Output:
    (tiebreak, key, session_id, last_touch)."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    gap_us = int(gap_s * 1_000_000)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                tiebreak: pd.Series(dtype="int64"),
                key: pd.Series(dtype="int64"),
                "session_id": pd.Series(dtype="int64"),
                "last_touch": pd.Series(dtype="object")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        lab = df[label].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us, tb, lab = k[order], us[order], tb[order], lab[order]
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        new_sess = new_key | np.concatenate(
            [[True], (us[1:] - us[:-1]) > gap_us])
        prev_lab = np.concatenate([[direct], lab[:-1]])
        touch = np.where(new_sess, direct, prev_lab)
        sess_cum = np.cumsum(new_sess) - 1
        key_starts = np.flatnonzero(new_key)
        key_runs = np.diff(np.append(key_starts, len(k)))
        sess_id = sess_cum - np.repeat(sess_cum[key_starts], key_runs)
        keep = lab == target
        return pd.DataFrame({tiebreak: tb[keep].astype("int64"),
                             key: k[keep].astype("int64"),
                             "session_id": sess_id[keep].astype("int64"),
                             "last_touch": touch[keep]})

    return partition_map(ds.select_columns([key, ts_col, tiebreak, label]),
                         [key], kernel, batch_format="pandas")


def time_to_convert(ds, target: str = "purchase", key: str = "user_id",
                    ts_col: str = "ts", tiebreak: str = "event_id",
                    label: str = "event_type", out: str = "us_to_convert"):
    """Forward-looking LEAD-to-event window: every event annotated with
    the microseconds until its key's NEXT *target* event STRICTLY AFTER
    it in ``(ts, tiebreak)`` order — time-to-conversion for every
    touchpoint, the mirror image of :func:`event_lag` (all prior windows
    in this module look backward; this is the suffix direction). Rows
    with no later target in their key carry ``-1`` (real values are
    always >= 0 after the sort, so the sentinel is unambiguous; the
    twin is ``COALESCE(.., -1)`` over ``MIN(CASE ..) OVER (ROWS BETWEEN
    1 FOLLOWING AND UNBOUNDED FOLLOWING)`` — the future-frame min of a
    nondecreasing column IS the next occurrence).

    ONE hash exchange; whole-partition vectorized kernel: lexsort by
    (key, ts, tiebreak), then ONE ``searchsorted`` of every row index
    into the sorted target-row positions (side='right' gives the first
    target strictly after), validity-gated by the row's key-segment end
    — no per-group Python, no reversed segmented scan."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                tiebreak: pd.Series(dtype="int64"),
                key: pd.Series(dtype="int64"),
                out: pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        lab = df[label].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us, tb, lab = k[order], us[order], tb[order], lab[order]
        n = len(k)
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        starts = np.flatnonzero(new_key)
        runs = np.diff(np.append(starts, n))
        seg_end = np.repeat(starts + runs, runs)  # exclusive, per row
        pidx = np.flatnonzero(lab == target)
        if len(pidx):
            j = np.searchsorted(pidx, np.arange(n), side="right")
            has = j < len(pidx)
            cand = pidx[np.minimum(j, len(pidx) - 1)]
            valid = has & (cand < seg_end)
            dt = np.where(valid, us[cand] - us, -1)
        else:
            dt = np.full(n, -1, dtype=np.int64)
        return pd.DataFrame({tiebreak: tb.astype("int64"),
                             key: k.astype("int64"),
                             out: dt.astype("int64")})

    return partition_map(ds.select_columns([key, ts_col, tiebreak, label]),
                         [key], kernel, batch_format="pandas")


def touches_before_first(ds, target: str = "purchase",
                         key: str = "user_id", ts_col: str = "ts",
                         tiebreak: str = "event_id",
                         label: str = "event_type",
                         out: str = "n_touches"):
    """Acquisition path length: per key WITH at least one *target*
    event, how many events came STRICTLY BEFORE the first target in
    ``(ts, tiebreak)`` order — the touches-to-conversion funnel depth
    (:func:`time_to_convert` measures the clock; this measures the
    effort). Keys that never convert emit nothing on both engines.

    ONE hash exchange; vectorized kernel: lexsort, per-key segment
    geometry, one ``minimum.reduceat`` over target positions, count =
    first-target position minus the key's segment start."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({key: pd.Series(dtype="int64"),
                                 out: pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        lab = df[label].to_numpy()
        order = np.lexsort((tb, us, k))
        k, lab = k[order], lab[order]
        n = len(k)
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        pos = np.where(lab == target, np.arange(n, dtype=np.int64), n)
        first_p = np.minimum.reduceat(pos, starts)
        has = first_p < n
        return pd.DataFrame({
            key: k[starts][has].astype("int64"),
            out: (first_p[has] - starts[has]).astype("int64")})

    return partition_map(ds.select_columns([key, ts_col, tiebreak,
                                            label]),
                         [key], kernel, batch_format="pandas")


def densify_days(ds, key: str = "user_id", ts_col: str = "ts",
                 out: str = "n_events", day_us: int = 86_400_000_000,
                 max_span: int = 10_000,
                 num_partitions: int | None = None):
    """Calendar densification ("fill the gaps"): one row per key per
    DAY between the key's first and last activity, with that day's
    event count — zero-filled for silent days. The generate_series +
    LEFT JOIN of SQL as a single per-key kernel; the only ROW-EXPANDING
    window op in the family (everything else annotates or contracts),
    which is what daily-active curves, churn features and forecasting
    spines need. Day is emitted as INTEGER epoch-days (a date column
    would hash-diverge on engine string forms).

    Shape: per-block (key, day) count partials (one pyarrow group_by —
    the shuffle then moves day-counts, not events), ONE hash exchange,
    then a vectorized densify kernel: lexsort, segment geometry, one
    ``arange`` re-based per key via run offsets, one scatter of the
    observed counts — no per-key Python, no join. Spans over
    *max_span* days are rejected loudly (a 1970-epoch outlier would
    expand one key into millions of rows silently otherwise)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from pypdfium2_ray.stages.exchange import partition_map

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        day = pc.divide(us, day_us)  # integer floor-div: us >= 0 epochs
        base = pa.table({key: t[key], "day": day})
        return base.group_by([key, "day"], use_threads=False) \
            .aggregate([([], "count_all")]) \
            .rename_columns([key, "day", "cnt"])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series(dtype="int64"),
                "day": pd.Series(dtype="int64"),
                out: pd.Series(dtype="int64")})
        g = df.groupby([key, "day"], sort=False, as_index=False)["cnt"] \
            .sum()
        k = g[key].to_numpy()
        d = g["day"].to_numpy().astype(np.int64)
        c = g["cnt"].to_numpy().astype(np.int64)
        order = np.lexsort((d, k))
        k, d, c = k[order], d[order], c[order]
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        runs = np.diff(np.append(starts, len(k)))
        mn = d[starts]
        span = d[starts + runs - 1] - mn + 1
        if int(span.max()) > max_span:
            raise ValueError(
                f"densify_days span {int(span.max())} days exceeds "
                f"max_span={max_span} — outlier timestamps would "
                f"silently explode the output")
        off = np.concatenate([[0], np.cumsum(span)])
        total = int(off[-1])
        out_key = np.repeat(k[starts], span)
        out_day = np.arange(total, dtype=np.int64) \
            - np.repeat(off[:-1], span) + np.repeat(mn, span)
        n = np.zeros(total, dtype=np.int64)
        keyidx = np.repeat(np.arange(len(starts)), runs)
        n[off[keyidx] + (d - mn[keyidx])] = c
        return pd.DataFrame({key: out_key.astype("int64"),
                             "day": out_day, out: n})

    partials = ds.select_columns([key, ts_col]) \
        .map_batches(partial, batch_format="pyarrow")
    return partition_map(partials, [key], kernel, batch_format="pandas",
                         num_partitions=num_partitions)


def bounce_rate(ds, key: str = "user_id", ts_col: str = "ts",
                tiebreak: str = "event_id", label: str = "event_type",
                gap_s: float = 1800.0):
    """Per-entry-label bounce report: sessionize (gap cut), take each
    session's FIRST label (the entry touchpoint) and size, then count
    sessions and single-event sessions ("bounces") per entry label —
    the landing-page bounce-rate table, fusing sessionize +
    FIRST-of-session + two aggregation levels into ONE keyed exchange.

    The per-partition kernel emits PARTIAL per-label counts (sessions
    are whole within a partition — the key exchange guarantees it), so
    the final combine is a single-block enum fold (label cardinality is
    fixed at any corpus size), not a second exchange. Counts are exact
    ints; rate = n_bounces / n_sessions is left to the consumer (a
    float rate would hash-diverge)."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    gap_us = int(gap_s * 1_000_000)
    empty = {"first_touch": pd.Series(dtype="object"),
             "n_sessions": pd.Series(dtype="int64"),
             "n_bounces": pd.Series(dtype="int64")}

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(empty)
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        lab = df[label].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us, lab = k[order], us[order], lab[order]
        new_sess = np.concatenate([[True], k[1:] != k[:-1]]) \
            | np.concatenate([[True], (us[1:] - us[:-1]) > gap_us])
        starts = np.flatnonzero(new_sess)
        runs = np.diff(np.append(starts, len(k)))
        part = pd.DataFrame({
            "first_touch": lab[starts],
            "n_sessions": np.ones(len(starts), np.int64),
            "n_bounces": (runs == 1).astype(np.int64)})
        return part.groupby("first_touch", sort=False,
                            as_index=False).sum()

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(empty)
        return df.groupby("first_touch", sort=False, as_index=False).sum()

    inner = partition_map(ds.select_columns([key, ts_col, tiebreak,
                                             label]),
                          [key], kernel, batch_format="pandas")
    return inner.repartition(1).map_batches(combine,
                                            batch_format="pandas",
                                            batch_size=None)


def entry_conversion(ds, target: str = "purchase", key: str = "user_id",
                     ts_col: str = "ts", tiebreak: str = "event_id",
                     label: str = "event_type", gap_s: float = 1800.0):
    """Per-entry-label conversion report: sessionize (gap cut), take
    each session's FIRST label (the entry touchpoint), and count
    sessions vs sessions containing at least one *target* event —
    "which landing flows convert", the conversion sibling of
    :func:`bounce_rate` (same fused one-exchange shape; counts stay
    exact ints, the rate is the consumer's division).

    The kernel reads both numbers off the session run-length geometry:
    entry label = label at each session start, converted = any target
    row in the run (one cumsum-difference over the target mask — no
    per-session Python). Per-partition PARTIAL label counts, folded in
    a single enum-sized block."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map

    gap_us = int(gap_s * 1_000_000)
    empty = {"first_touch": pd.Series(dtype="object"),
             "__s": pd.Series(dtype="int64"),
             "__c": pd.Series(dtype="int64")}

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(empty)
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        lab = df[label].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us, lab = k[order], us[order], lab[order]
        new_sess = np.concatenate([[True], k[1:] != k[:-1]]) \
            | np.concatenate([[True], (us[1:] - us[:-1]) > gap_us])
        starts = np.flatnonzero(new_sess)
        hits = np.concatenate(([0], np.cumsum(lab == target)))
        ends = np.append(starts[1:], len(k))
        converted = (hits[ends] - hits[starts]) > 0
        part = pd.DataFrame({
            "first_touch": lab[starts],
            "__s": np.ones(len(starts), np.int64),
            "__c": converted.astype(np.int64)})
        return part.groupby("first_touch", sort=False,
                            as_index=False).sum()

    partials = partition_map(
        ds.select_columns([key, ts_col, tiebreak, label]),
        [key], kernel, batch_format="pandas")
    return grouped_aggregate(partials, ["first_touch"],
                             {"n_sessions": ("__s", "sum"),
                              "n_converting": ("__c", "sum")},
                             combine="single_block")


def burst_count(ds, window_s: float = 3600.0, key: str = "user_id",
                ts_col: str = "ts", tiebreak: str = "event_id",
                out: str = "n_burst"):
    """Temporal self-join count, all rows out: every event annotated
    with how many of its key's LATER events (strictly after in
    ``(ts, tiebreak)`` order) fall within *window_s* seconds — burst /
    flood detection, the banded self-join ``a JOIN b ON same key AND
    b after a AND b.ts - a.ts <= W`` collapsed to a count without ever
    materializing the pairs.

    ONE hash exchange; fully vectorized kernel with NO per-key loop:
    after the (key, ts, tiebreak) lexsort, each key segment's
    timestamps are rebased to its own start and lifted onto a
    per-segment composite axis ``segidx * B + us_rel`` (B > max span +
    window), so a single global ``searchsorted`` of ``composite + W``
    yields every row's in-window upper bound; the count is ``upper −
    position − 1``. Segments whose span would overflow the composite
    axis are rejected loudly (pre-split such keys by time first)."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    win_us = int(window_s * 1_000_000)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                tiebreak: pd.Series(dtype="int64"),
                key: pd.Series(dtype="int64"),
                out: pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us, tb = k[order], us[order], tb[order]
        n = len(k)
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        starts = np.flatnonzero(new_key)
        runs = np.diff(np.append(starts, n))
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), runs)
        rel = us - np.repeat(us[starts], runs)
        span = int(rel.max()) if n else 0
        b = span + win_us + 2
        if len(starts) * b >= 2 ** 62:
            raise ValueError(
                f"burst_count composite axis overflow: {len(starts)} "
                f"keys x span {b} us — pre-split long-lived keys by "
                "time before counting bursts")
        comp = seg * b + rel
        upper = np.searchsorted(comp, comp + win_us, side="right")
        cnt = upper - np.arange(n, dtype=np.int64) - 1
        return pd.DataFrame({tiebreak: tb.astype("int64"),
                             key: k.astype("int64"),
                             out: cnt.astype("int64")})

    return partition_map(ds.select_columns([key, ts_col, tiebreak]),
                         [key], kernel, batch_format="pandas")


def trailing_sum(ds, window_s: float = 3600.0, key: str = "user_id",
                 ts_col: str = "ts", tiebreak: str = "event_id",
                 value_col: str = "value_e4", out: str = "trail_sum_e4"):
    """Event-granularity trailing RANGE-frame sum, all rows out: every
    event annotated with the sum of its key's values over the last
    *window_s* seconds INCLUDING every equal-timestamp peer — SQL's
    ``SUM(v) OVER (ORDER BY us RANGE BETWEEN W PRECEDING AND CURRENT
    ROW)``, the velocity / spend-rate feature at full event resolution
    (``rolling_window_sum`` is its day-grain cousin). *value_col* is
    caller-pre-scaled int64.

    ONE hash exchange; no per-key loop: the :func:`burst_count`
    composite axis (``segidx * B + rel``, B > span + window) turns the
    per-key lower-bound search into ONE global ``searchsorted``; the
    peer-inclusive upper bound is each timestamp run's end; the sum is
    a prefix-cumsum difference."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    win_us = int(window_s * 1_000_000)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                tiebreak: pd.Series(dtype="int64"),
                key: pd.Series(dtype="int64"),
                out: pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        v = df[value_col].to_numpy().astype(np.int64)
        order = np.lexsort((tb, us, k))
        k, us, tb, v = k[order], us[order], tb[order], v[order]
        n = len(k)
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        starts = np.flatnonzero(new_key)
        runs = np.diff(np.append(starts, n))
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), runs)
        rel = us - np.repeat(us[starts], runs)
        b = (int(rel.max()) if n else 0) + win_us + 2
        if len(starts) * b >= 2 ** 62:
            raise ValueError(
                "trailing_sum composite axis overflow — pre-split "
                "long-lived keys by time first")
        comp = seg * b + rel
        lower = np.searchsorted(comp, comp - win_us, side="left")
        # peer-inclusive upper bound: end of each (key, us) run
        new_run = new_key | np.concatenate([[True], us[1:] != us[:-1]])
        rstarts = np.flatnonzero(new_run)
        rruns = np.diff(np.append(rstarts, n))
        run_end = np.repeat(rstarts + rruns, rruns)
        cs = np.concatenate(([0], np.cumsum(v)))
        return pd.DataFrame({tiebreak: tb.astype("int64"),
                             key: k.astype("int64"),
                             out: (cs[run_end] - cs[lower])
                             .astype("int64")})

    return partition_map(ds.select_columns([key, ts_col, tiebreak,
                                            value_col]),
                         [key], kernel, batch_format="pandas")


def active_streak(ds, key: str = "user_id", ts_col: str = "ts",
                  day_us: int = 86_400_000_000,
                  num_partitions: int | None = None):
    """Longest run of CONSECUTIVE active days per key plus the total
    active-day count — the retention/habit streak metric (the
    "gaps-and-islands on integers" classic; :func:`event_islands` is
    its label-run sibling, this is the day-grid one; the SQL twin is
    the ``day - ROW_NUMBER()`` grouping trick).

    Shape: per-block distinct ``(key, day)`` pre-combine (the shuffle
    moves day flags, not events), ONE hash exchange, then a vectorized
    kernel — global re-distinct, lexsort, island boundaries where the
    day step != 1, per-key max run via one reduceat over island
    lengths grouped by key."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from pypdfium2_ray.stages.exchange import partition_map

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        day = pc.divide(us, day_us)
        return pa.table({key: t[key], "day": day}) \
            .group_by([key, "day"], use_threads=False).aggregate([])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series(dtype="int64"),
                "max_streak": pd.Series(dtype="int64"),
                "n_active_days": pd.Series(dtype="int64")})
        g = df.drop_duplicates([key, "day"])
        k = g[key].to_numpy()
        d = g["day"].to_numpy().astype(np.int64)
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        n = len(k)
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        new_isl = new_key | np.concatenate([[True], (d[1:] - d[:-1]) != 1])
        istarts = np.flatnonzero(new_isl)
        ilens = np.diff(np.append(istarts, n))
        ikey = k[istarts]
        # per-key max island length + total days: islands are already
        # key-contiguous after the lexsort
        kstarts = np.flatnonzero(np.concatenate(
            [[True], ikey[1:] != ikey[:-1]]))
        return pd.DataFrame({
            key: ikey[kstarts].astype("int64"),
            "max_streak": np.maximum.reduceat(ilens, kstarts)
            .astype("int64"),
            "n_active_days": np.add.reduceat(ilens, kstarts)
            .astype("int64")})

    partials = ds.select_columns([key, ts_col]) \
        .map_batches(partial, batch_format="pyarrow")
    return partition_map(partials, [key], kernel, batch_format="pandas",
                         num_partitions=num_partitions)


def state_duration(ds, key: str = "user_id", ts_col: str = "ts",
                   tiebreak: str = "event_id", label: str = "event_type",
                   num_partitions: int | None = None):
    """Time-in-state accounting: per ``(key, label)``, the total
    microseconds the key SPENT in that state — each event's state holds
    until the key's next event (LEAD semantics); the key's last event
    holds nothing and contributes no time. Output also counts the
    holding events (``n_holds``). The categorical sibling of
    :func:`time_weighted_sum` (which integrates a numeric level).

    ONE hash exchange; lexsort + one shift + boundary mask, then a
    single Cython groupby-sum over ``(key, label)`` within the
    partition — no per-group Python."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series(dtype="int64"),
                label: pd.Series(dtype="object"),
                "dur_us": pd.Series(dtype="int64"),
                "n_holds": pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        lab = df[label].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us, lab = k[order], us[order], lab[order]
        same_next = np.concatenate([k[1:] == k[:-1], [False]])
        dur = np.where(same_next,
                       np.concatenate([us[1:], [0]]) - us, 0)
        g = pd.DataFrame({key: k[same_next], label: lab[same_next],
                          "dur_us": dur[same_next]})
        out = g.groupby([key, label], sort=False, as_index=False) \
            .agg(dur_us=("dur_us", "sum"), n_holds=("dur_us", "size"))
        return out.astype({"dur_us": "int64", "n_holds": "int64"})

    return partition_map(ds.select_columns([key, ts_col, tiebreak,
                                            label]),
                         [key], kernel, batch_format="pandas",
                         num_partitions=num_partitions)


def session_handoff(ds, key: str = "user_id", ts_col: str = "ts",
                    tiebreak: str = "event_id", label: str = "event_type",
                    gap_s: float = 1800.0):
    """Cross-session transition matrix: for every pair of CONSECUTIVE
    sessions of one key, count (last label of session i, first label of
    session i+1) — "what did they leave on, what did they come back
    to", the re-engagement flow table. :func:`transition_counts` counts
    adjacent events WITHIN the stream; this counts the handoff ACROSS
    the session boundary only.

    ONE hash exchange; the kernel reuses the
    :func:`first_touch_attribution` session geometry (lexsort by
    ``(key, ts, tiebreak)``, gap-or-key boundary mask). Session-level
    arrays are read straight off the run-length geometry: first label =
    label at each session start, last label = label just before the
    next session start; adjacent same-key session pairs are one shifted
    compare over the session-start keys. Per-partition PARTIAL pair
    counts (sessions are whole within a partition), then a single-block
    enum-sized combine — label alphabets are fixed at any corpus size,
    so no second exchange."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map

    gap_us = int(gap_s * 1_000_000)
    empty = {"prev_last": pd.Series(dtype="object"),
             "next_first": pd.Series(dtype="object"),
             "__n": pd.Series(dtype="int64")}

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(empty)
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        lab = df[label].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us, lab = k[order], us[order], lab[order]
        new_sess = np.concatenate([[True], k[1:] != k[:-1]]) \
            | np.concatenate([[True], (us[1:] - us[:-1]) > gap_us])
        sstarts = np.flatnonzero(new_sess)
        ksess = k[sstarts]
        # adjacent sessions of the SAME key: boundary rows sstarts[i]
        # with ksess[i] == ksess[i-1]; the previous session's last row
        # is the row just before the boundary
        same = ksess[1:] == ksess[:-1]
        b = sstarts[1:][same]
        pairs = pd.DataFrame({"prev_last": lab[b - 1],
                              "next_first": lab[b]})
        g = pairs.groupby(["prev_last", "next_first"], sort=False,
                          as_index=False).size()
        return g.rename(columns={"size": "__n"}).astype({"__n": "int64"})

    partials = partition_map(
        ds.select_columns([key, ts_col, tiebreak, label]),
        [key], kernel, batch_format="pandas")
    return grouped_aggregate(partials, ["prev_last", "next_first"],
                             {"n": ("__n", "sum")},
                             combine="single_block")


def new_vs_returning(ds, key: str = "user_id", ts_col: str = "ts",
                     day_us: int = 86_400_000_000,
                     num_partitions: int | None = None):
    """Daily new-vs-returning actives: per day, how many distinct keys
    were active, how many were active for the FIRST time ever, and how
    many had been seen before — the growth-accounting top strip of
    every analytics dashboard (DAU split by novelty).

    Shape: per-block distinct ``(key, day)`` pre-combine (the shuffle
    moves day flags, not events — same as :func:`active_streak`), ONE
    hash exchange on the key, then a vectorized kernel: global
    re-distinct, lexsort, each key's first day read off the run
    boundary, one Cython groupby emitting per-day PARTIAL (n_active,
    n_new) counts. The final combine is single-block keyed on day —
    day cardinality grows with the TIME RANGE, not the corpus, so the
    fold block stays small for any bounded retention window."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from pypdfium2_ray.stages.agg import grouped_aggregate
    from pypdfium2_ray.stages.exchange import partition_map

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        day = pc.divide(us, day_us)  # ts >= epoch: trunc == floor
        return pa.table({key: t[key], "day": day}) \
            .group_by([key, "day"], use_threads=False).aggregate([])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"day": pd.Series(dtype="int64"),
                                 "__act": pd.Series(dtype="int64"),
                                 "__new": pd.Series(dtype="int64")})
        g = df.drop_duplicates([key, "day"])
        k = g[key].to_numpy()
        d = g["day"].to_numpy().astype(np.int64)
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        is_first = np.concatenate([[True], k[1:] != k[:-1]])
        out = pd.DataFrame({"day": d,
                            "__act": np.ones(len(d), np.int64),
                            "__new": is_first.astype(np.int64)})
        return out.groupby("day", sort=False, as_index=False).sum()

    partials = ds.select_columns([key, ts_col]) \
        .map_batches(partial, batch_format="pyarrow")
    per_part = partition_map(partials, [key], kernel,
                             batch_format="pandas",
                             num_partitions=num_partitions)
    days = grouped_aggregate(per_part, ["day"],
                             {"n_active": ("__act", "sum"),
                              "n_new": ("__new", "sum")},
                             combine="single_block")

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "n_returning", pc.subtract(t["n_active"], t["n_new"]))

    return days.map_batches(finish, batch_format="pyarrow")


def first_session_size(ds, key: str = "user_id", ts_col: str = "ts",
                       tiebreak: str = "event_id", gap_s: float = 1800.0):
    """Novelty-effect report: per key, the size of its FIRST session
    (session 0 under the gap cut), the session count, and the lifetime
    event count — "how hard do users hit the product on day one vs
    ever after". ONE hash exchange; the kernel reuses the
    :func:`first_touch_attribution` session geometry (lexsort + gap
    boundary masks) and reads all three numbers off the run-length
    arrays — no per-key Python."""
    import numpy as np
    import pandas as pd

    from pypdfium2_ray.stages.exchange import partition_map

    gap_us = int(gap_s * 1_000_000)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: pd.Series(dtype="int64"),
                "s0_events": pd.Series(dtype="int64"),
                "n_sessions": pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64")})
        k = df[key].to_numpy()
        us = df[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        tb = df[tiebreak].to_numpy()
        order = np.lexsort((tb, us, k))
        k, us = k[order], us[order]
        n = len(k)
        new_key = np.concatenate([[True], k[1:] != k[:-1]])
        new_sess = new_key | np.concatenate(
            [[True], (us[1:] - us[:-1]) > gap_us])
        sstarts = np.flatnonzero(new_sess)
        sruns = np.diff(np.append(sstarts, n))
        kstarts = np.flatnonzero(new_key)
        kruns = np.diff(np.append(kstarts, n))
        # session-start rows grouped by key: key starts are a subset of
        # session starts, so count sessions per key via searchsorted
        sess_per_key = np.diff(np.searchsorted(
            sstarts, np.append(kstarts, n)))
        s0 = sruns[np.searchsorted(sstarts, kstarts)]
        return pd.DataFrame({key: k[kstarts].astype("int64"),
                             "s0_events": s0.astype("int64"),
                             "n_sessions": sess_per_key.astype("int64"),
                             "n_events": kruns.astype("int64")})

    return partition_map(ds.select_columns([key, ts_col, tiebreak]),
                         [key], kernel, batch_format="pandas")
