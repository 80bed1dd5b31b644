#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line per run.

Headline: the flagship extraction pipeline (documents -> cc_pages ->
ExtractText actor pool -> consume) over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``), plus per-query timings for representative
operators. ``--scaling`` runs the headline at two parallelism levels in
fresh processes (N=8 and 4N=32 CPUs, the driver-sanctioned stand-in for the
N-vs-4N-node cluster criterion) and reports both throughputs + efficiency.

This script OWNS its Ray session (entry()/queries() never do).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _consume(ds) -> int:
    """Stream-consume a Dataset, returning row count (no driver materialize
    of payload columns — count() executes the plan)."""
    return ds.count()


def _headline(sf_dir: str) -> dict:
    """Flagship extraction: rows + input bytes + wall seconds."""
    import pyarrow.parquet as pq
    import __ray_entry__ as E

    pf = pq.ParquetFile(f"{sf_dir.rstrip('/')}/documents.parquet")
    rows_in = pf.metadata.num_rows
    bytes_in = sum(pf.metadata.row_group(i).total_byte_size
                   for i in range(pf.metadata.num_row_groups))

    t0 = time.perf_counter()
    n = _consume(E.q_extract_text(sf_dir))
    wall = time.perf_counter() - t0
    return dict(rows=n, rows_in=rows_in, bytes_in=bytes_in, wall_s=wall,
                docs_per_s=rows_in / wall, mb_per_s=bytes_in / wall / 1e6)


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as E

    head = _headline(sf_dir)

    queries = {}
    bench_queries = ["token_stats", "lang_id", "dedup_exact", "ann_topk",
                     "pricing_summary", "orders_by_region", "events_rollup",
                     "minhash_dups"]
    qs = E.queries()
    for name in bench_queries:
        t0 = time.perf_counter()
        _consume(qs[name](sf_dir))
        queries[name] = round(time.perf_counter() - t0, 3)
    queries["extract_text"] = round(head["wall_s"], 3)

    result = {
        "metric": "extract_docs_per_sec",
        "value": round(head["wall_s"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "docs_per_s": round(head["docs_per_s"], 1),
        "mb_per_s": round(head["mb_per_s"], 2),
        "rows": head["rows"],
    }
    ray.shutdown()
    return result


def _scaling_child(sf_dir: str, num_cpus: int) -> dict:
    """Run the headline in a FRESH process at a given parallelism level."""
    code = (
        "import json,sys,time,ray; sys.path.insert(0, %r);"
        "ray.init(address='local', num_cpus=%d, include_dashboard=False,"
        " logging_level='ERROR');"
        "import bench; print('RESULT::'+json.dumps(bench._headline(%r)));"
        "ray.shutdown()"
        % (os.path.dirname(os.path.abspath(__file__)), num_cpus, sf_dir))
    env = dict(os.environ)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::"):])
    raise RuntimeError(f"scaling child failed: {out.stderr[-2000:]}")


def run_scaling(sf_dir: str, low: int = 8, high: int = 32) -> dict:
    r_low = _scaling_child(sf_dir, low)
    r_high = _scaling_child(sf_dir, high)
    eff = (r_high["docs_per_s"] / r_low["docs_per_s"]) / (high / low)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"extract_text_cpus{low}": round(r_low["wall_s"], 3),
            f"extract_text_cpus{high}": round(r_high["wall_s"], 3),
        },
        "sf": sf_dir,
        "num_cpus": high,
        "docs_per_s_low": round(r_low["docs_per_s"], 1),
        "docs_per_s_high": round(r_high["docs_per_s"], 1),
        "cpus_low": low,
        "cpus_high": high,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    else:
        print(json.dumps(run_bench(SF_DIR, NUM_CPUS)))
