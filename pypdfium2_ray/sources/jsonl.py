"""JSONL (gzip-per-shard) container support — the interchange format of
webtext corpora (one JSON object per line; the convention of public
corpus releases and dataset hubs).

The reference opens documents from path / bytes / buffer
(``/root/reference/src/pypdfium2/_helpers/document.py:49-90``); at
corpus scale the *container* is the source format, so next to the WARC
codec (``sources/warc``) the engine reads and writes JSONL natively:

- :func:`write_jsonl_shards` — the distributed sink, same discipline
  as ``write_warc_shards``: md5 hash-shard on a key column
  (run/partitioning-invariant), ONE exchange, each partition serialized
  to its own ``part-NNNNN.jsonl.gz`` by the worker that owns it (rows
  sorted by key inside the shard and gzip ``mtime=0``, so shard BYTES
  are deterministic across runs), temp-then-rename so a crashed run
  never leaves a half shard, manifest rows back to the driver.
  Serialization is pandas ``to_json(lines=True, force_ascii=True)`` —
  the vectorized C encoder — except for float-bearing tables, which
  take a stdlib path because pandas caps doubles at 15 significant
  digits and exact round-trip needs shortest-repr (17).
- :func:`read_jsonl` — a streaming Ray Data source:
  ``read_binary_files`` over the shard files (one file = one read task
  = one block) + per-file gzip inflate + ``pyarrow.json.read_json``
  (Arrow's C++ block parser — the rows never pass through Python
  objects).

Values must be JSON-native (int/float/str/bool); binary payloads
belong in WARC or Parquet, not JSONL — enforced loudly at write time.
"""

from __future__ import annotations

import gzip
import io
import os

import pyarrow as pa

_MANIFEST_T = pa.schema([("shard", pa.int32()), ("path", pa.string()),
                         ("n_records", pa.int64()),
                         ("n_bytes", pa.int64())])

_JSON_OK = (pa.types.is_integer, pa.types.is_floating, pa.types.is_string,
            pa.types.is_boolean, pa.types.is_null)


def write_jsonl_shards(ds, out_dir: str, n_shards: int,
                       key_col: str = "doc_id") -> pa.Table:
    """Distributed JSONL sink — see module docstring. Returns the
    manifest table (shard, path, n_records, n_bytes)."""
    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.exchange import partition_map

    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        for field in t.schema:
            if not any(ok(field.type) for ok in _JSON_OK):
                raise TypeError(
                    f"write_jsonl_shards: column {field.name!r} has "
                    f"non-JSON-native type {field.type} — binary/nested "
                    f"payloads belong in WARC or Parquet shards")
        shard = [md5_hash64(str(v).encode()) % n_shards
                 for v in t[key_col].to_pylist()]
        return t.append_column("shard", pa.array(shard, pa.int32()))

    def write_partition(t: pa.Table) -> pa.Table:
        out = []
        if t.num_rows:
            t = t.sort_by([("shard", "ascending"),
                           (key_col, "ascending")])
            shards = t["shard"].to_numpy()
            import numpy as np
            bounds = np.flatnonzero(np.diff(shards)).tolist()
            starts = [0] + [b + 1 for b in bounds]
            ends = [b + 1 for b in bounds] + [len(shards)]
            for s, e in zip(starts, ends):
                g = t.slice(s, e - s).drop_columns(["shard"])
                shard = int(shards[s])
                path = os.path.join(out_dir,
                                    f"part-{shard:05d}.jsonl.gz")
                tmp = path + ".tmp"
                if any(pa.types.is_floating(f.type) for f in g.schema):
                    # pandas to_json caps at 15 significant digits and
                    # doubles need 17 to round-trip — float-bearing
                    # tables take the stdlib path whose repr floats are
                    # shortest-exact (per-row, the price of exactness)
                    import json
                    names = g.column_names
                    cols = [g[c].to_pylist() for c in names]
                    payload = ("\n".join(
                        json.dumps(dict(zip(names, row)),
                                   ensure_ascii=True,
                                   separators=(",", ":"))
                        for row in zip(*cols)) + "\n").encode("ascii")
                else:
                    payload = g.to_pandas().to_json(
                        orient="records", lines=True,
                        force_ascii=True).encode("ascii")
                with open(tmp, "wb") as fh:
                    with gzip.GzipFile(fileobj=fh, mode="wb",
                                       mtime=0) as gz:
                        gz.write(payload)
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


def read_jsonl(path: str, schema: pa.Schema | None = None):
    """Streaming JSONL source: one shard file per read task, Arrow C++
    JSON parse per file (``schema`` pins the types when inference must
    not drift between shards, e.g. an all-null column)."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        import pyarrow.json as pj
        opts = (pj.ParseOptions(explicit_schema=schema)
                if schema is not None else None)
        parts = []
        for raw in batch["bytes"].to_pylist():
            data = gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw
            parts.append(pj.read_json(io.BytesIO(data),
                                      parse_options=opts))
        if not parts:
            return (schema.empty_table() if schema is not None
                    else pa.table({}))
        return pa.concat_tables(parts, promote_options="default")

    files = rd.read_binary_files(path, file_extensions=["gz", "jsonl"])
    return files.map_batches(parse, batch_format="pyarrow")
