"""CSV (gzip-per-shard) container support — the third interchange
format next to WARC (``sources/warc``) and JSONL (``sources/jsonl``):
the tabular-metadata convention of public dataset releases (URL lists,
quality scores, index manifests).

Same sink discipline as the other two: md5 hash-shard on a key column
(run/partitioning-invariant), ONE exchange, each partition serializes
its own ``part-NNNNN.csv.gz`` (rows key-sorted inside the shard, gzip
``mtime=0`` — shard BYTES deterministic across runs), temp-then-rename
crash safety, manifest rows as the only driver collect.

Serialization is Arrow's C++ CSV writer (``pyarrow.csv.write_csv``) —
vectorized, RFC-4180 quoting (embedded commas/quotes/newlines survive),
and doubles emit shortest-exact repr, so the round-trip is lossless
without the stdlib fallback JSONL needs (pinned by the roundtrip test).
``read_csv_shards`` inflates one shard per read task and parses with
Arrow's C++ CSV reader; pass ``schema`` to pin column types — CSV
carries no type metadata, so inference WILL drift across shards (an
all-null or all-digits string column) unless pinned. Binary / nested
columns are rejected loudly at write time (they belong in WARC or
Parquet); empty strings round-trip as empty strings, nulls as nulls
(Arrow writes null as an unquoted empty field and "" quoted).
"""

from __future__ import annotations

import gzip
import io
import os

import pyarrow as pa

from pypdfium2_ray.sources.jsonl import _MANIFEST_T

_CSV_OK = (pa.types.is_integer, pa.types.is_floating, pa.types.is_string,
           pa.types.is_boolean, pa.types.is_null, pa.types.is_timestamp)


def write_csv_shards(ds, out_dir: str, n_shards: int,
                     key_col: str = "doc_id") -> pa.Table:
    """Distributed CSV sink — see module docstring. Returns the manifest
    table (shard, path, n_records, n_bytes)."""
    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.exchange import partition_map

    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        for field in t.schema:
            if not any(ok(field.type) for ok in _CSV_OK):
                raise TypeError(
                    f"write_csv_shards: column {field.name!r} has "
                    f"non-CSV-representable type {field.type} — binary/"
                    f"nested payloads belong in WARC or Parquet shards")
        shard = [md5_hash64(str(v).encode()) % n_shards
                 for v in t[key_col].to_pylist()]
        return t.append_column("shard", pa.array(shard, pa.int32()))

    def write_partition(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.csv as pcsv
        out = []
        if t.num_rows:
            t = t.sort_by([("shard", "ascending"),
                           (key_col, "ascending")])
            shards = t["shard"].to_numpy()
            bounds = np.flatnonzero(np.diff(shards)).tolist()
            starts = [0] + [b + 1 for b in bounds]
            ends = [b + 1 for b in bounds] + [len(shards)]
            for s, e in zip(starts, ends):
                g = t.slice(s, e - s).drop_columns(["shard"])
                shard = int(shards[s])
                path = os.path.join(out_dir, f"part-{shard:05d}.csv.gz")
                tmp = path + ".tmp"
                buf = io.BytesIO()
                pcsv.write_csv(g, buf)
                with open(tmp, "wb") as fh:
                    with gzip.GzipFile(fileobj=fh, mode="wb",
                                       mtime=0) as gz:
                        gz.write(buf.getvalue())
                os.replace(tmp, path)
                out.append((shard, path, e - s, os.path.getsize(path)))
        return pa.table({
            "shard": pa.array([o[0] for o in out], pa.int32()),
            "path": pa.array([o[1] for o in out], pa.string()),
            "n_records": pa.array([o[2] for o in out], pa.int64()),
            "n_bytes": pa.array([o[3] for o in out], pa.int64()),
        }, schema=_MANIFEST_T)

    sharded = ds.map_batches(assign, batch_format="pyarrow")
    manifest = partition_map(sharded, ["shard"], write_partition,
                             num_partitions=min(n_shards, 64))
    tables = list(manifest.iter_batches(batch_format="pyarrow",
                                        batch_size=None))
    t = (pa.concat_tables(tables) if tables else _MANIFEST_T.empty_table())
    return t.sort_by("shard")


def read_csv_shards(path: str, schema: pa.Schema | None = None):
    """Streaming CSV source: one shard file per read task, Arrow C++
    CSV parse per file. ``schema`` pins column types (CSV has no type
    metadata — always pass it for multi-shard reads)."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        import pyarrow.csv as pcsv
        # the writer emits null as an unquoted empty field and "" quoted:
        # strings_can_be_null + quoted_strings_can_be_null=False is the
        # reader-side half of that distinction
        kw = dict(strings_can_be_null=True,
                  quoted_strings_can_be_null=False)
        conv = pcsv.ConvertOptions(
            column_types=({f.name: f.type for f in schema}
                          if schema is not None else None), **kw)
        parts = []
        for raw in batch["bytes"].to_pylist():
            data = gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw
            parts.append(pcsv.read_csv(io.BytesIO(data),
                                       convert_options=conv))
        if not parts:
            return (schema.empty_table() if schema is not None
                    else pa.table({}))
        return pa.concat_tables(parts, promote_options="default")

    files = rd.read_binary_files(path, file_extensions=["gz", "csv"])
    return files.map_batches(parse, batch_format="pyarrow")
