"""Pure vectorized scalar/sketch functions (no Ray).

The engine's analogue of the reference's scalar-function layer (SURVEY §2.8:
UTF-16 decode policy ``textpage.py:85``, CRLF convention ``textpage.py:24-26``,
color packing ``internal/utils.py:9-24``), widened with the text-analysis and
sketching functions a large-scale training-data pipeline needs. Everything
here operates on pyarrow arrays / numpy and is deterministic; the matching
ANSI-SQL expression (for the DuckDB oracle) is generated from the SAME
constants so the two cannot drift.
"""

from pypdfium2_ray.functions.text import (  # noqa: F401
    TOKEN_RE, PUNCT_RE, LANG_STOPWORDS,
    token_count, term_count, fingerprint_md5, lang_scores, lang_pred,
    collapse_ws, quality_columns,
    sql_token_count, sql_term_count, sql_lang_pred, sql_collapse_ws,
)
from pypdfium2_ray.functions.sketch import (  # noqa: F401
    char_shingles, word_ngrams, minhash_signature, band_keys,
    estimate_jaccard, simhash64, simhash_band_keys, hamming64, jaccard,
)
