"""BPE merge-pair counting — the distributed core of tokenizer training.

One round of byte-pair-encoding training (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016 — public literature) is: count every adjacent symbol pair across
the corpus, weighted by occurrence, and merge the most frequent.  The
counting step is the only part that touches the data, and it is what a
100 TB pipeline must distribute; the merge loop itself operates on the
returned vocabulary-sized table.

The scale trick is the classical word-frequency factoring: pair counts
are computed over the DISTINCT-WORD table weighted by word frequency,
never over raw tokens.  At corpus scale the token stream is ~10^12
while the vocabulary is ~10^6-10^7, so the per-word Python pair loop
runs once per distinct word (vocab-sized, like ``hash_sample``'s
inherent per-value md5), not once per occurrence — the occurrence
dimension is handled entirely by vectorized counting.

Semantics: words are ASCII-non-ws runs (the corpus-wide tokenizer
convention shared with every SQL twin); symbols are characters (round
0 of BPE — running later rounds means re-invoking with the merge
applied, which only changes the per-word symbolization); a word of
length L contributes L-1 overlapping pairs ("aaa" counts ("a","a")
twice) times its corpus frequency.  Output: the global top-``k`` pairs
by (count DESC, pair ASC) — a total order, so the selected set is
unique and partition-invariant.

Distributed shape: vectorized Arrow split/flatten/filter + C++
group-count per block, ONE word exchange (pre-combined partials, rows
bounded by block vocab), per-word pair expansion on the distinct-word
table, ONE pair exchange (pre-combined), then the ``stages/topk``
partial-bound selection (only ``k x n_blocks`` rows ever reach the
final sort).  Nothing un-pre-combined ever moves.

No reference analogue (pypdfium2 is single-document); tokenizer-tier
sibling of ``stages/vocab`` / ``functions/text``.
"""

from __future__ import annotations

import collections

import pyarrow as pa
import pyarrow.compute as pc

from pypdfium2_ray.stages.agg import grouped_aggregate
from pypdfium2_ray.stages.topk import topk

I64 = pa.int64()
_WS = r"[ \t\r\n\f\v]+"


def _word_partial(text_col: str):
    """Per-block (word, f) partial counts — fully vectorized: Arrow
    regex split -> flatten -> drop the empty boundary strings -> C++
    group count."""
    def fn(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern_regex(pc.cast(t[text_col], pa.string()), _WS))
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"word": flat}).group_by(
            ["word"], use_threads=False).aggregate([("word", "count")])
        return pa.table({"word": g["word"],
                         "f": pc.cast(g["word_count"], I64)})
    return fn


def _pair_partial(t: pa.Table) -> pa.Table:
    """Distinct-word rows -> per-block (pair, cnt) partials. The loop
    is per DISTINCT word (vocab-sized by construction — see module
    docstring); counting across words is a C-speed Counter update."""
    cnt: collections.Counter = collections.Counter()
    words = t["word"].to_pylist()
    fs = t["f"].to_pylist()
    for w, f in zip(words, fs):
        for i in range(len(w) - 1):
            cnt[w[i:i + 2]] += f
    return pa.table({"pair": pa.array(list(cnt.keys()), pa.string()),
                     "cnt": pa.array(list(cnt.values()), I64)})


def merge_pair_counts(ds, text_col: str = "text", k: int = 40,
                      num_partitions: int | None = None):
    """Dataset[(pair:str, cnt:int64)] — the top-``k`` BPE merge
    candidates; see module docstring."""
    if k < 1:
        raise ValueError("k must be >= 1")
    wf = grouped_aggregate(
        ds.map_batches(_word_partial(text_col), batch_format="pyarrow"),
        keys=["word"], specs={"f": ("f", "sum")},
        num_partitions=num_partitions)
    pairs = grouped_aggregate(
        wf.map_batches(_pair_partial, batch_format="pyarrow"),
        keys=["pair"], specs={"cnt": ("cnt", "sum")},
        num_partitions=num_partitions)
    return topk(pairs, ["cnt", "pair"], k, descending=[True, False])
