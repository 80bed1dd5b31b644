"""CLI tests — subprocess-free (call main() in-process against the session
Ray), mirroring the reference's golden-output CLI layer
(tests/test_cli.py:45-75 discipline)."""

import pyarrow.parquet as pq
import pytest

from pypdfium2_ray.__main__ import main


def test_cli_extract_text(ray_session, fixture_parquet, tmp_path, capsys):
    out = str(tmp_path / "out")
    assert main(["extract-text", fixture_parquet, "-o", out]) == 0
    t = pq.read_table(out)
    assert t.num_rows == 16
    texts = dict(zip(t["url"].to_pylist(), t["extracted_text"].to_pylist()))
    assert texts["https://fixtures.test/multipage"] == (
        "# Page 1\nPage\r\n1\n\n# Page 2\nPage\r\n2\n\n# Page 3\nPage\r\n3\n")


def test_cli_toc_output(ray_session, fixture_parquet, capsys):
    assert main(["toc", fixture_parquet]) == 0
    out = capsys.readouterr().out
    assert "# https://fixtures.test/toc" in out
    # nested outline printed with indentation, child counts and 1-based
    # pages (reference cli/toc.py framing: [{count:+}|*] title -> page)
    assert "[+2] One -> 1" in out
    assert "    [*] One A -> 1" in out


def test_cli_pdfinfo_output(ray_session, fixture_parquet, capsys):
    assert main(["pdfinfo", fixture_parquet]) == 0
    out = capsys.readouterr().out
    assert "# https://fixtures.test/metadata" in out
    assert "Producer: LibreOffice 6.4" in out
    assert "page 1: 595 x 842" in out


def test_cli_render(ray_session, fixture_parquet, tmp_path):
    out = str(tmp_path / "rendered")
    assert main(["render", fixture_parquet, "-o", out, "--scale", "0.25"]) == 0
    t = pq.read_table(out)
    ok = t.filter(__import__("pyarrow").compute.equal(t["status"], "ok"))
    assert ok.num_rows > 10
    assert all(d.as_py().startswith(b"\x89PNG") for d in ok["data"])


def test_cli_fixtures(tmp_path, capsys):
    out = str(tmp_path / "cc.parquet")
    assert main(["fixtures", "-o", out, "--synthetic", "5"]) == 0
    assert pq.read_table(out).num_rows == 21


def test_cli_extract_text_checkpoint_resume(ray_session, fixture_parquet,
                                            tmp_path, capsys):
    out = str(tmp_path / "ckpt_out")
    assert main(["extract-text", fixture_parquet, "-o", out,
                 "--checkpoint"]) == 0
    assert "ran=1 skipped=0" in capsys.readouterr().out
    # second run: shard already done -> skipped
    assert main(["extract-text", fixture_parquet, "-o", out,
                 "--checkpoint"]) == 0
    assert "ran=0 skipped=1" in capsys.readouterr().out
    import os
    assert os.path.exists(os.path.join(out, "_MANIFEST.jsonl"))


def test_cli_fonts_output(ray_session, fixture_parquet, tmp_path, capsys):
    """fonts subcommand (cli/fonts.py analogue): per-doc distinct fonts
    with usage counts, faces resolved through the sysfont chain."""
    assert main(["fonts", fixture_parquet]) == 0
    out = capsys.readouterr().out
    assert "Helvetica" in out and "pt w" in out

    # bold + code resolve to styled/mapped faces
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        "url": ["doc://x/1"],
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": [b"<html><body><h1>T</h1><p>a <code>c</code></p>"
                 b"</body></html>"],
        "text": [""], "lang": ["en"],
    })
    p = str(tmp_path / "one.parquet")
    pq.write_table(t, p)
    assert main(["fonts", p]) == 0
    out = capsys.readouterr().out
    assert "Helvetica Bold  24pt w700" in out          # h1
    assert "Courier  12pt w400" in out                 # code -> Courier


def test_cli_dedup_minhash_and_shuffle(ray_session, tmp_path):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pypdfium2_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    texts = ["alpha beta gamma delta epsilon zeta eta theta",
             "alpha beta gamma delta epsilon zeta eta iota",  # near-dup of 0
             "completely different words entirely here now thanks",
             "unrelated content again nothing shared with others"]
    pq.write_table(pa.table({"doc_id": [0, 1, 2, 3], "text": texts}), src)

    out = str(tmp_path / "dedup_out")
    assert main(["dedup", src, "-o", out, "--method", "minhash",
                 "--threshold", "0.5"]) == 0
    kept = sorted(duckdb.sql(f"select doc_id from '{out}/*.parquet'")
                  .fetchnumpy()["doc_id"].tolist())
    assert kept == [0, 2, 3]          # near-dup pair collapsed to min id

    shuf = str(tmp_path / "shuf_out")
    assert main(["shuffle", src, "-o", shuf, "--shards", "2"]) == 0
    t = pq.read_table(shuf)
    assert t.num_rows == 4 and "pos" in t.schema.names


def test_cli_decontam_three_tiers(ray_session, tmp_path):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pypdfium2_ray.__main__ import main

    src = str(tmp_path / "corpus.parquet")
    texts = ["the quick brown fox jumps",          # trigram + substring hit
             "a quick brown dog sits",             # bigram overlap only
             "exact heldout prompt text",          # exact-hash hit
             "nothing in common at all"]
    pq.write_table(pa.table({"doc_id": [0, 1, 2, 3], "text": texts}), src)
    heldout = tmp_path / "heldout.txt"
    heldout.write_text("benchmark says quick brown fox here\n"
                       "exact heldout prompt text\n")

    def kept(out):
        return sorted(duckdb.sql(f"select doc_id from '{out}/*.parquet'")
                      .fetchnumpy()["doc_id"].tolist())

    out1 = str(tmp_path / "ng")
    assert main(["decontam", src, "-o", out1, "--heldout", str(heldout),
                 "--method", "ngram"]) == 0
    # trigram "quick brown fox" kills 0; doc 2 shares "exact heldout
    # prompt" + "heldout prompt text" trigrams too
    assert kept(out1) == [1, 3]

    out2 = str(tmp_path / "sub")
    assert main(["decontam", src, "-o", out2, "--heldout", str(heldout),
                 "--method", "substring"]) == 0
    assert kept(out2) == [0, 1, 3]     # only the verbatim full-line leak

    out3 = str(tmp_path / "hash")
    assert main(["decontam", src, "-o", out3, "--heldout", str(heldout),
                 "--method", "hash"]) == 0
    assert kept(out3) == [0, 1, 3]     # only the exact-equal doc


def test_cli_curate_end_to_end(ray_session, tmp_path):
    """extract -> quality gate -> exact dedup -> shuffled shards: plant a
    content duplicate (identical page under two urls) and a too-short
    page; the curated output keeps one of the twins and drops the stub."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    body = ("curated corpus body with plenty of ordinary words to pass "
            "the token gate easily " * 3)
    page = ("<html><body><main><p>" + body + "</p></main></body></html>"
            ).encode()
    stub = b"<html><body><main><p>tiny</p></main></body></html>"
    uniq = ("<html><body><main><p>" + body + " unique tail</p></main>"
            "</body></html>").encode()
    cc = pa.table({
        "url": pa.array([f"https://t.test/{i}" for i in range(4)]),
        "warc_ts": pa.array([0] * 4, pa.timestamp("us")),
        "html": pa.array([page, page, stub, uniq], pa.binary()),
        "text": pa.array([""] * 4),
        "lang": pa.array(["en"] * 4),
    })
    src = str(tmp_path / "cc.parquet")
    pq.write_table(cc, src)
    out = str(tmp_path / "curated")
    assert main(["curate", src, "-o", out, "--shards", "2"]) == 0
    t = pq.read_table(out)
    # the stub fails the token gate; the twins share a fingerprint
    assert t.num_rows == 2
    assert len(set(t["extracted_text"].to_pylist())) == 2
    assert {"shard", "pos", "fingerprint"} <= set(t.column_names)
