"""Per-partition checkpointing: manifest lineage, resume skips done shards."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def sharded_input(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    for s in range(3):
        t = pa.table({
            "doc_id": pa.array(range(s * 10, s * 10 + 10), pa.int64()),
            "text": [f"doc {i} text" for i in range(s * 10, s * 10 + 10)],
        })
        pq.write_table(t, d / f"shard{s}.parquet")
    return str(d)


def _pipeline(path):
    import ray.data as rd
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        is_err = pc.equal(pc.subtract(t["doc_id"],
                                      pc.multiply(pc.divide(t["doc_id"], 10), 10)), 9)
        status = pc.if_else(is_err, "format_error", "ok")
        return t.append_column("status", status)

    return rd.read_parquet(path).map_batches(f, batch_format="pyarrow")


def test_checkpointed_run_and_resume(ray_session, sharded_input, tmp_path):
    from pypdfium2_ray.state import (
        CheckpointManifest, run_checkpointed, shard_inputs)
    out = str(tmp_path / "out")
    shards = shard_inputs(sharded_input)
    assert [s for s, _ in shards] == ["shard0", "shard1", "shard2"]

    r1 = run_checkpointed(shards, _pipeline, out)
    assert r1["ran"] == ["shard0", "shard1", "shard2"]
    assert r1["total_done"] == 3

    man = CheckpointManifest(out)
    recs = {r["shard"]: r for r in man.records()}
    assert recs["shard0"]["rows_in"] == 10
    assert recs["shard0"]["rows_out"] == 10
    assert recs["shard0"]["n_errors"] == 1         # doc_id 9 per shard
    assert recs["shard0"]["bytes_in"] > 0
    assert os.path.isdir(os.path.join(out, "shard=shard1"))

    # resume: nothing re-runs
    r2 = run_checkpointed(shards, _pipeline, out)
    assert r2["ran"] == []
    assert r2["skipped"] == ["shard0", "shard1", "shard2"]

    # partial manifest: drop shard2's record -> only shard2 re-runs
    recs_list = [r for r in man.records() if r["shard"] != "shard2"]
    with open(man.path, "w") as f:
        for r in recs_list:
            f.write(json.dumps(r) + "\n")
    r3 = run_checkpointed(shards, _pipeline, out)
    assert r3["ran"] == ["shard2"]


def test_resume_with_different_grouping_fails_fast(ray_session,
                                                   sharded_input, tmp_path):
    """Regrouping hazard: a manifest whose done shards don't exist in the
    new shard list means stale shard= dirs would duplicate rows — the run
    must refuse, not silently redo work under new names."""
    from pypdfium2_ray.state import run_checkpointed, shard_inputs
    out = str(tmp_path / "out")
    run_checkpointed(shard_inputs(sharded_input, group_size=1),
                     _pipeline, out)
    with pytest.raises(ValueError, match="re-sharded/regrouped"):
        run_checkpointed(shard_inputs(sharded_input, group_size=2),
                         _pipeline, out)
    # same grouping still resumes cleanly
    r = run_checkpointed(shard_inputs(sharded_input, group_size=1),
                         _pipeline, out)
    assert r["ran"] == []


def test_resume_after_midwrite_crash_does_not_duplicate(
        ray_session, sharded_input, tmp_path):
    """A crash mid-write leaves partial part files in the shard dir with NO
    manifest record; the rerun must replace them, not append (write_parquet
    appends uniquely-named files, so a naive rerun doubles rows)."""
    import pyarrow.dataset as pads
    from pypdfium2_ray.state import run_checkpointed, shard_inputs
    out = str(tmp_path / "out")
    shards = shard_inputs(sharded_input)

    # simulate the crashed run: a partial (and even a stale temp) output
    # for shard1, manifest absent/not recording it
    crashed = os.path.join(out, "shard=shard1")
    os.makedirs(crashed)
    pq.write_table(pa.table({"doc_id": pa.array([999], pa.int64()),
                             "text": ["partial row from crashed run"],
                             "status": ["ok"]}),
                   os.path.join(crashed, "stale-part.parquet"))
    os.makedirs(os.path.join(out, "_tmp.shard=shard1"))

    r = run_checkpointed(shards, _pipeline, out)
    assert r["ran"] == ["shard0", "shard1", "shard2"]
    got = pads.dataset(os.path.join(out, "shard=shard1"),
                       format="parquet").to_table()
    assert got.num_rows == 10                       # no stale row, no dupes
    assert 999 not in got["doc_id"].to_pylist()
    assert not os.path.exists(os.path.join(out, "_tmp.shard=shard1"))
