"""Cross-snapshot delta + incremental dedup (stages/snapshot.py)."""

import pyarrow as pa
import pytest

from pypdfium2_ray.stages.snapshot import (
    SnapshotKeyError, append_state, incremental_dedup, snapshot_delta)


def _ds(rows, schema):
    import ray.data as rd
    return rd.from_arrow(pa.table(rows, schema=schema))


_SNAP_T = pa.schema([("url", pa.string()), ("fingerprint", pa.string())])


def test_snapshot_delta_classes(ray_session):
    old = _ds({"url": ["a", "b", "c"], "fingerprint": ["1", "2", "3"]},
              _SNAP_T)
    new = _ds({"url": ["b", "c", "d"], "fingerprint": ["2", "9", "4"]},
              _SNAP_T)
    got = dict(snapshot_delta(old, new).to_pandas()
               .itertuples(index=False, name=None))
    assert got == {"a": "gone", "b": "unchanged", "c": "changed", "d": "new"}


def test_snapshot_delta_partition_invariant(ray_session):
    urls = [f"u{i}" for i in range(60)]
    old = _ds({"url": urls[:40], "fingerprint": [str(i) for i in range(40)]},
              _SNAP_T)
    new = _ds({"url": urls[20:],
               "fingerprint": [str(i if i % 3 else -i) for i in range(20, 60)]},
              _SNAP_T)
    a = snapshot_delta(old, new).to_pandas().sort_values("url")
    b = snapshot_delta(old.repartition(7), new.repartition(3),
                       num_partitions=5).to_pandas().sort_values("url")
    assert a.values.tolist() == b.values.tolist()


def test_snapshot_delta_dup_key_loud(ray_session):
    old = _ds({"url": ["a", "a"], "fingerprint": ["1", "2"]}, _SNAP_T)
    new = _ds({"url": ["a"], "fingerprint": ["1"]}, _SNAP_T)
    with pytest.raises(Exception):   # raised inside the Ray task
        snapshot_delta(old, new).to_pandas()


def test_incremental_dedup_fused(ray_session):
    state = pa.table({"fingerprint": pa.array(["f1", "f2"])})
    new = _ds({"url": ["n1", "n2", "n3", "n4", "n5"],
               "fingerprint": ["f1", "f3", "f3", "f4", "f3"]}, _SNAP_T)
    out = incremental_dedup(new, state).to_pandas().sort_values("url")
    # f1 seen-before -> dropped; f3 keeps min url with n_dups=3; f4 kept
    assert out[["url", "fingerprint", "n_dups"]].values.tolist() == [
        ["n2", "f3", 3], ["n4", "f4", 1]]


def test_incremental_dedup_state_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    state_dir = str(tmp_path / "state")
    first = _ds({"url": ["a", "b"], "fingerprint": ["x", "y"]}, _SNAP_T)
    surv1 = incremental_dedup(first, pa.table(
        {"fingerprint": pa.array([], pa.string())}))
    append_state(surv1, state_dir)
    second = _ds({"url": ["c", "d"], "fingerprint": ["y", "z"]}, _SNAP_T)
    surv2 = incremental_dedup(
        second, rd.read_parquet(state_dir)).to_pandas()
    assert surv2["url"].tolist() == ["d"]    # y already in state


def test_apply_changelog(ray_session):
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from pypdfium2_ray.stages.exchange import partition_hint
    from pypdfium2_ray.stages.snapshot import apply_changelog

    def t(rows):
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "version": pa.array([r[2] for r in rows], pa.int64()),
            "op": pa.array([r[3] for r in rows])})

    base = t([(1, "a", 0, "upsert"), (2, "b", 0, "upsert"),
              (3, "c", 0, "upsert")])
    delta = t([(1, "a2", 1, "upsert"),          # update wins
               (1, "a3", 3, "upsert"),          # later update wins more
               (2, "", 5, "delete"),            # delete wins
               (4, "d", 1, "upsert"),           # insert
               (4, "", 2, "delete"),            # ...then deleted
               (5, "e", 1, "upsert")])
    for parts in (1, 3):
        with partition_hint(2):
            out = apply_changelog(
                rd.from_arrow(base).repartition(parts),
                rd.from_arrow(delta)).to_pandas()
        got = {r.doc_id: (r.text, r.version) for r in out.itertuples()}
        assert got == {1: ("a3", 3), 3: ("c", 0), 5: ("e", 1)}
        assert "op" not in out.columns
    dup = t([(1, "x", 0, "upsert")])
    with _pytest.raises(Exception, match="duplicate"):
        apply_changelog(rd.from_arrow(base),
                        rd.from_arrow(dup)).to_pandas()


def test_docs_v2_mutation_rules(ray_session, tmp_path):
    """The synthetic second crawl behind incremental_extract: gone rows
    dropped, update marker on %6==1, re-publications keyed +1e7."""
    import pandas as pd

    from pypdfium2_ray.queries import relational as E
    df = pd.DataFrame({
        "doc_id": list(range(20)),
        "text": [f"t{i}" for i in range(20)],
        "lang": ["en"] * 20, "source": ["s"] * 20})
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = E._docs_v2(str(tmp_path)).to_pandas()
    got = dict(zip(out.doc_id, out.text))
    assert 4 not in got and 13 not in got          # %9==4 gone
    assert got[1] == "t1 UPD" and got[7] == "t7 UPD" and got[19] == "t19 UPD"
    assert got[0] == "t0" and got[2] == "t2"
    assert got[10_000_002] == "t2 NEWDOC"          # %13==2 re-published
    assert got[10_000_015] == "t15 NEWDOC"
    assert len(got) == 18 + 2
