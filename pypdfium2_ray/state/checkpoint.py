"""Per-partition checkpointing with lineage + counters (north_rule).

The reference has no resume story — a failed run reruns from scratch
(SURVEY §4 "Checkpoint / resume"). At 10^12 rows that is unacceptable, so
the engine processes input as named **shards** (one shard = one input
fragment / file / key range), writes each shard's output under its own
directory, and appends one JSON lineage record per finished shard to a
manifest. Resume = anti-join of the manifest's done-set against the input
shard list — finished partitions are skipped without reading a byte.

Layout::

    out_dir/
      _MANIFEST.jsonl          # one record per completed shard (atomic append)
      shard=<name>/*.parquet   # that shard's output (own directory)

Manifest record: ``{shard, rows_in, rows_out, bytes_in, n_errors, wall_s,
status}`` — the lineage counters of SURVEY §7.1 step 4.

Counters come from parquet footer metadata of input and output (no extra
data scan); ``n_errors`` counts ``status != 'ok'`` rows via a column-pruned
scan of the just-written output only.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable

_MANIFEST = "_MANIFEST.jsonl"


@dataclass
class CheckpointManifest:
    out_dir: str

    @property
    def path(self) -> str:
        return os.path.join(self.out_dir, _MANIFEST)

    def done_shards(self) -> set[str]:
        done = set()
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("status") == "done":
                        done.add(rec["shard"])
        return done

    def append(self, record: dict) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        # single-writer append; atomic enough at line granularity (O_APPEND)
        with open(self.path, "a") as f:
            f.write(json.dumps(record, sort_keys=True) + "\n")

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(ln) for ln in f if ln.strip()]


def shard_inputs(input_dir: str, pattern: str = ".parquet",
                 group_size: int = 1) -> list[tuple[str, str | list[str]]]:
    """(shard_name, path_or_paths) per input fragment, deterministic order.

    ``group_size`` > 1 buckets that many files into ONE shard (the value
    becomes a list of paths — ``read_parquet`` accepts it directly): the
    checkpoint/restart unit should hold enough data to amortize per-shard
    pipeline startup and parallelize internally. Tiny per-file shards are
    overhead-dominated (measured ~50x slower than the streaming pipeline
    on 1250-row files); size shards to minutes of work, not seconds.
    """
    files = []
    for name in sorted(os.listdir(input_dir)):
        if name.endswith(pattern):
            files.append((os.path.splitext(name)[0],
                          os.path.join(input_dir, name)))
    if group_size <= 1:
        return files
    out: list[tuple[str, str | list[str]]] = []
    for i in range(0, len(files), group_size):
        chunk = files[i:i + group_size]
        out.append((f"{chunk[0][0]}__x{len(chunk)}",
                    [p for _, p in chunk]))
    return out


def _parquet_meta(path_or_dir: str | list[str]) -> tuple[int, int]:
    """(rows, byte_size) from parquet footers only — no data scan."""
    import pyarrow.parquet as pq
    if isinstance(path_or_dir, (list, tuple)):
        paths = list(path_or_dir)
    elif os.path.isdir(path_or_dir):
        paths = []
        for root, _dirs, files in os.walk(path_or_dir):
            paths += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    else:
        paths = [path_or_dir]
    rows = 0
    size = 0
    unknown = False
    for p in paths:
        size += os.path.getsize(p)
        if p.endswith(".parquet"):
            rows += pq.ParquetFile(p).metadata.num_rows
        else:
            # non-parquet input shard (e.g. a WARC container): byte size
            # is still footer-free truth; the row count is not knowable
            # without a scan — report -1 (unknown), never a wrong number
            unknown = True
    return (-1 if unknown else rows), size


def _count_errors(out_shard_dir: str, status_col: str = "status") -> int:
    """status != 'ok' count via a column-pruned scan of one shard's output."""
    import pyarrow.dataset as pads
    import pyarrow.compute as pc
    try:
        dset = pads.dataset(out_shard_dir, format="parquet")
        if status_col not in dset.schema.names:
            return 0
        n_ok = dset.count_rows(filter=pc.field(status_col) == "ok")
        return dset.count_rows() - n_ok
    except (OSError, ValueError, FileNotFoundError):
        return 0


def run_checkpointed(input_shards: list[tuple[str, str]],
                     pipeline_fn: Callable[[str], "object"],
                     out_dir: str, status_col: str = "status") -> dict:
    """Run ``pipeline_fn(input_path) -> Dataset`` per shard, resumably.

    Shards already marked done in the manifest are skipped. Each shard's
    Dataset streams straight to ``out_dir/shard=<name>/`` via
    ``write_parquet`` (never materialized on the driver). Returns a summary
    with per-run totals.
    """
    import shutil
    manifest = CheckpointManifest(out_dir)
    done = manifest.done_shards()
    # Regrouping guard: grouped shard names encode group_size
    # (shard_inputs "__xN" suffix). Resuming with a DIFFERENT grouping
    # yields disjoint names — done-markers stop matching, work reruns
    # under new names, and the old grouping's shard= dirs stay on disk,
    # silently duplicating rows for whole-directory readers. A done shard
    # absent from the current shard set is exactly that hazard: fail fast.
    current = {shard for shard, _ in input_shards}
    stale = sorted(done - current)
    if stale:
        raise ValueError(
            f"checkpoint manifest at {out_dir} has {len(stale)} completed "
            f"shard(s) not in the current shard list (e.g. {stale[0]!r}) — "
            "the input was re-sharded/regrouped since the last run. Resume "
            "with the same group_size, or start a fresh out_dir.")
    ran, skipped = [], []
    for shard, path in input_shards:
        if shard in done:
            skipped.append(shard)
            continue
        t0 = time.perf_counter()
        ds = pipeline_fn(path)
        shard_dir = os.path.join(out_dir, f"shard={shard}")
        tmp_dir = os.path.join(out_dir, f"_tmp.shard={shard}")
        # a shard not marked done may have partial output from a crashed
        # run (mid-write failure leaves part files; write_parquet APPENDS
        # uniquely-named files, so a naive rerun would duplicate rows).
        # Write to a temp dir and atomically rename into place on success;
        # clear any stale temp/partial dirs first.
        for stale in (tmp_dir, shard_dir):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        ds.write_parquet(tmp_dir)
        os.replace(tmp_dir, shard_dir)
        wall = time.perf_counter() - t0
        rows_in, bytes_in = _parquet_meta(path)
        rows_out, _ = _parquet_meta(shard_dir)
        manifest.append(dict(
            shard=shard, status="done",
            rows_in=rows_in, rows_out=rows_out, bytes_in=bytes_in,
            n_errors=_count_errors(shard_dir, status_col),
            wall_s=round(wall, 3)))
        ran.append(shard)
    return dict(ran=ran, skipped=skipped,
                total_done=len(manifest.done_shards()))
