#!/usr/bin/env python
"""Sharded parallel test runner — the <10-minute full-suite gate.

``python -m pytest tests/ -x -q`` stays the canonical serial gate (it is
what the driver runs), but at 746 tests over a 4-CPU session-scoped Ray
fixture it takes ~30 min wall. This runner splits the test FILES into K
shards (greedy longest-first by a static weight table + file size, so the
graph/exchange-heavy files don't pile onto one shard) and runs K pytest
subprocesses concurrently, each with its OWN small local Ray cluster
(the conftest honors ``GRAFT_TEST_OBJSTORE_GB`` so K object stores fit
the box). No pytest-xdist dependency — plain subprocesses.

Usage::

    python scripts/partest.py           # K = min(6, cpus // 4)
    python scripts/partest.py -k 8      # explicit shard count

Exit code is non-zero iff any shard fails; each shard's tail is printed
on failure. Measured on the 32-CPU sandbox: ~6-7 min wall for the full
suite (vs ~30 serial).
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: rough relative weights for files whose runtime dwarfs their size
#: (iterative graph fixtures, warc corpus builds); everything else is
#: weighted by file size, which tracks test count well enough
HEAVY = {
    "test_hits.py": 110, "test_pagerank.py": 110, "test_trustrank.py": 60,
    "test_kcore.py": 60, "test_labelprop.py": 60, "test_bfs.py": 50,
    "test_components.py": 50, "test_triangles.py": 40, "test_walks.py": 50,
    "test_audit.py": 90, "test_warmpool.py": 40, "test_warc.py": 40,
    "test_exchange.py": 40, "test_checkpoint.py": 40, "test_snapshot.py": 40,
    "test_pipeline.py": 60, "test_reference_parity.py": 40,
    "test_dedup_family.py": 60, "test_ann.py": 60, "test_bm25.py": 40,
    "test_cli.py": 50, "test_tdigest.py": 30, "test_pq.py": 30,
}


def shards_of(files: list[str], k: int) -> list[list[str]]:
    def weight(f):
        base = os.path.getsize(f) / 1024.0
        return HEAVY.get(os.path.basename(f), 0) + base

    buckets: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(k)]
    for f in sorted(files, key=weight, reverse=True):
        i = min(range(k), key=lambda j: buckets[j][0])
        w, lst = buckets[i]
        lst.append(f)
        buckets[i] = (w + weight(f), lst)
    return [lst for _, lst in buckets]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", type=int, default=None, help="shard count")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    cpus = os.cpu_count() or 8
    k = args.k or max(2, min(6, cpus // 4))

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    shards = shards_of(files, k)
    env = dict(os.environ)
    env["GRAFT_TEST_OBJSTORE_GB"] = env.get("GRAFT_TEST_OBJSTORE_GB", "4")
    env.setdefault("RAY_DEDUP_LOGS", "0")

    t0 = time.time()
    procs = []
    logs = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        log = open(f"/tmp/partest_shard{i}.log", "w")
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", *shard],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT)
        procs.append((i, p, shard))
        logs.append(log)

    fail = False
    for i, p, shard in procs:
        rc = p.wait(timeout=args.timeout)
        tail = open(f"/tmp/partest_shard{i}.log").read().splitlines()
        summary = next((ln for ln in reversed(tail)
                        if "passed" in ln or "failed" in ln or "error" in ln),
                       "(no summary)")
        print(f"shard {i}: rc={rc}  {summary}")
        if rc != 0:
            fail = True
            print("\n".join(tail[-30:]))
    for log in logs:
        log.close()
    print(f"total wall: {time.time() - t0:.0f}s across {len(procs)} shards")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
