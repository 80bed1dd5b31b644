"""From-scratch WARC/1.0 container support — Common Crawl's native wire
format (ISO 28500 record framing, one gzip member per record in ``.warc.gz``
files, the crawl convention that makes records independently seekable).

The reference opens documents from path / bytes / buffer
(``/root/reference/src/pypdfium2/_helpers/document.py:49-90``); at
10^12-document crawl scale the *container* is the source format, so the
engine reads and writes it natively:

- :func:`warc_record` / :func:`parse_warc` — the pure codec (bytes in/out,
  no Ray), covered by round-trip and torn-record tests.
- :func:`read_warc` — a streaming Ray Data source: ``read_binary_files``
  over the shard files (one file = one read task = one block, the natural
  ~1 GB Common Crawl shard granularity) + a vectorizable record walk that
  emits ``(url:string, warc_ts:timestamp[us], html:binary)`` rows — exactly
  the BASELINE.json ``input_hint`` payload columns.
- :func:`write_warc_shards` — the distributed sink: ONE hash exchange on
  the shard key, each partition serialized to its own ``.warc.gz`` by the
  worker that owns it (rows sorted by url inside the shard so the file
  bytes are partitioning-invariant), manifest rows back to the driver.
  Shard files are written temp-then-rename so a crashed run never leaves a
  half shard (same discipline as ``state/checkpoint.py``).

Gzip members are written with ``mtime=0`` so shard bytes are deterministic
across runs (resumability/auditing depend on it).
"""

from __future__ import annotations

import gzip
import io
import os

import pyarrow as pa

_EPOCH_DAYS = (1970, 1, 1)

# ---------------------------------------------------------------------------
# pure codec

_WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"
#: HTTP response envelope wrapped around each payload (msgtype=response
#: records carry the full HTTP message, per the crawl convention)
_HTTP_HEAD = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"


def _ts_to_warc_date(ts_us: int) -> bytes:
    """Microsecond timestamp -> ``YYYY-MM-DDThh:mm:ssZ`` (WARC-Date).
    Manual civil-time conversion (no ``datetime.now`` anywhere near the
    data path; pure arithmetic keeps it vector-friendly if ever needed)."""
    import datetime as _dt
    d = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=ts_us)
    return (f"{d.year:04d}-{d.month:02d}-{d.day:02d}T"
            f"{d.hour:02d}:{d.minute:02d}:{d.second:02d}Z").encode()


def _warc_date_to_ts(date: bytes) -> int:
    """Inverse of :func:`_ts_to_warc_date` -> microseconds since epoch."""
    import datetime as _dt
    s = date.decode()
    d = _dt.datetime(int(s[0:4]), int(s[5:7]), int(s[8:10]),
                     int(s[11:13]), int(s[14:16]), int(s[17:19]))
    return int((d - _dt.datetime(1970, 1, 1)).total_seconds()) * 1_000_000


def warc_record(url: str, ts_us: int, payload: bytes,
                record_type: str = "response",
                record_id: str | None = None) -> bytes:
    """Serialize ONE WARC record (headers + HTTP envelope + payload +
    the two-CRLF record terminator). ``record_id`` defaults to a
    deterministic urn derived from the url (no uuid4 — shard bytes must
    be reproducible)."""
    if record_id is None:
        import hashlib
        record_id = "urn:graft:" + hashlib.md5(url.encode()).hexdigest()
    body = (_HTTP_HEAD
            + b"Content-Length: " + str(len(payload)).encode() + _CRLF
            + _CRLF + payload)
    head = (_WARC_VERSION + _CRLF
            + b"WARC-Type: " + record_type.encode() + _CRLF
            + b"WARC-Record-ID: <" + record_id.encode() + b">" + _CRLF
            + b"WARC-Date: " + _ts_to_warc_date(ts_us) + _CRLF
            + b"WARC-Target-URI: " + url.encode() + _CRLF
            + b"Content-Type: application/http; msgtype=response" + _CRLF
            + b"Content-Length: " + str(len(body)).encode() + _CRLF
            + _CRLF)
    return head + body + _CRLF + _CRLF


def warcinfo_record(filename: str) -> bytes:
    """Leading ``warcinfo`` record (crawl files carry one; the reader must
    skip non-response records)."""
    body = (b"software: pypdfium2_ray warc writer\r\n"
            b"format: WARC File Format 1.0\r\n")
    head = (_WARC_VERSION + _CRLF
            + b"WARC-Type: warcinfo" + _CRLF
            + b"WARC-Record-ID: <urn:graft:warcinfo:"
            + filename.encode() + b">" + _CRLF
            + b"WARC-Date: 2026-01-01T00:00:00Z" + _CRLF
            + b"WARC-Filename: " + filename.encode() + _CRLF
            + b"Content-Type: application/warc-fields" + _CRLF
            + b"Content-Length: " + str(len(body)).encode() + _CRLF
            + _CRLF)
    return head + body + _CRLF + _CRLF


def write_warc(records, path: str, gzip_records: bool = True) -> int:
    """Write ``records`` — an iterable of ``(url, ts_us, payload)`` — as one
    WARC file (``.warc.gz`` convention: every record its own gzip member,
    ``mtime=0`` for byte determinism). Returns the record count (excl. the
    warcinfo header record)."""
    name = os.path.basename(path)
    n = 0
    with open(path, "wb") as f:
        chunks = [warcinfo_record(name)]
        for url, ts_us, payload in records:
            chunks.append(warc_record(url, ts_us, payload))
            n += 1
        if gzip_records:
            for c in chunks:
                f.write(gzip.compress(c, mtime=0))
        else:
            for c in chunks:
                f.write(c)
    return n


class WarcFormatError(ValueError):
    """Torn or non-WARC bytes. Loud by design: a half-written shard must
    fail the read, not silently drop its tail records."""


def parse_warc(data: bytes):
    """Walk one WARC file's bytes (gzip multi-member or plain) and yield
    ``(url:str, ts_us:int, payload:bytes)`` per *response* record.
    Framing is driven by ``Content-Length`` exactly (payloads may contain
    anything, including ``WARC/1.0`` lookalikes)."""
    if data[:2] == b"\x1f\x8b":
        # multi-member gzip: GzipFile concatenates members transparently
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    pos, n = 0, len(data)
    while pos < n:
        if data.startswith(_CRLF, pos):        # inter-record padding
            pos += 2
            continue
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if not data.startswith(_WARC_VERSION, pos) or hdr_end < 0:
            raise WarcFormatError(f"bad record framing at byte {pos}")
        headers = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            raise WarcFormatError(f"missing Content-Length at byte {pos}")
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            raise WarcFormatError(f"torn record at byte {pos}")
        if data[body_end:body_end + 4] != _CRLF + _CRLF:
            raise WarcFormatError(f"bad record terminator at byte {pos}")
        pos = body_end + 4
        if headers.get(b"warc-type") != b"response":
            continue
        body = data[body_start:body_end]
        # strip the HTTP envelope: payload begins after its blank line
        sep = body.find(_CRLF + _CRLF)
        if sep < 0:
            raise WarcFormatError("response record without HTTP envelope")
        yield (headers[b"warc-target-uri"].decode(),
               _warc_date_to_ts(headers[b"warc-date"]),
               body[sep + 4:])


# ---------------------------------------------------------------------------
# Ray Data source / sink

#: output schema of :func:`read_warc` (BASELINE.json input_hint payload)
WARC_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
])


def _records_table(batch: pa.Table) -> pa.Table:
    """One ``read_binary_files`` batch (N whole shard files) -> one Arrow
    table of records. The per-record walk is inherent container parsing
    (variable-length framing); everything row-ward of it stays Arrow."""
    urls: list[str] = []
    ts: list[int] = []
    payloads: list[bytes] = []
    for buf in batch["bytes"]:
        for url, ts_us, payload in parse_warc(buf.as_py()):
            urls.append(url)
            ts.append(ts_us)
            payloads.append(payload)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(payloads, pa.binary()),
    })


def read_warc(paths):
    """Streaming WARC source: one read task per shard file (Common Crawl
    sizes shards ~1 GB, the right block granularity), records exploded to
    ``WARC_SCHEMA`` rows inside the same task. ``paths`` is a file, a list
    of files, or a directory of ``.warc``/``.warc.gz`` shards."""
    import ray.data as rd
    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(
            os.path.join(paths, f) for f in os.listdir(paths)
            if f.endswith((".warc", ".warc.gz")))
        if not paths:
            raise FileNotFoundError("no .warc/.warc.gz shards in directory")
    ds = rd.read_binary_files(paths)
    return ds.map_batches(_records_table, batch_format="pyarrow")


def write_warc_shards(ds, out_dir: str, n_shards: int,
                      key_col: str = "url") -> pa.Table:
    """Distributed WARC sink: hash-shard ``ds`` (columns url, warc_ts,
    html) on ``key_col`` md5 — run/partitioning-invariant like
    ``stages/shuffle`` — then each partition writes its own
    ``part-NNNNN.warc.gz`` (rows sorted by url; temp-then-rename).
    Returns the manifest table (shard, path, n_records, n_bytes),
    n_shards rows — the only thing that crosses back to the driver."""
    from pypdfium2_ray.functions.sketch import md5_hash64
    from pypdfium2_ray.stages.exchange import partition_map

    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        shard = [md5_hash64(str(v).encode()) % n_shards
                 for v in t[key_col].to_pylist()]
        return t.append_column("shard", pa.array(shard, pa.int32()))

    _MANIFEST_T = pa.schema([("shard", pa.int32()), ("path", pa.string()),
                             ("n_records", pa.int64()),
                             ("n_bytes", pa.int64())])

    def write_partition(t: pa.Table) -> pa.Table:
        out = []
        if t.num_rows:
            ts_us = t.column("warc_ts").cast(pa.int64())
            t = (t.set_column(t.schema.get_field_index("warc_ts"),
                              "warc_ts", ts_us)
                  .sort_by([("shard", "ascending"), ("url", "ascending")]))
            shards = t["shard"].to_numpy()
            import numpy as np
            bounds = np.flatnonzero(np.diff(shards)).tolist()
            starts = [0] + [b + 1 for b in bounds]
            ends = [b + 1 for b in bounds] + [len(shards)]
            for s, e in zip(starts, ends):
                g = t.slice(s, e - s)
                shard = int(shards[s])
                path = os.path.join(out_dir, f"part-{shard:05d}.warc.gz")
                tmp = path + ".tmp"
                n = write_warc(zip(g["url"].to_pylist(),
                                   g["warc_ts"].to_pylist(),
                                   g["html"].to_pylist()), tmp)
                os.replace(tmp, path)
                out.append((shard, path, n, os.path.getsize(path)))
        return pa.table({
            "shard": pa.array([o[0] for o in out], pa.int32()),
            "path": pa.array([o[1] for o in out], pa.string()),
            "n_records": pa.array([o[2] for o in out], pa.int64()),
            "n_bytes": pa.array([o[3] for o in out], pa.int64()),
        }, schema=_MANIFEST_T)

    sharded = ds.map_batches(assign, batch_format="pyarrow")
    manifest = partition_map(sharded, ["shard"], write_partition,
                             num_partitions=min(n_shards, 64))
    # manifest is n_shards tiny rows — the one legitimate driver collect
    tables = list(manifest.iter_batches(batch_format="pyarrow",
                                        batch_size=None))
    t = (pa.concat_tables(tables) if tables else _MANIFEST_T.empty_table())
    return t.sort_by("shard")
