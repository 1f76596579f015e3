"""WordPiece greedy segmentation (LLM-pipeline extension; no reference
counterpart — algorithm per Wu et al., "Google's Neural Machine
Translation System", 2016 §4.1 / the BERT tokenizer's
longest-match-first rule).

``wordpiece_encode`` segments every document against a corpus-derived
vocabulary (top-``_WP_VOCAB`` words by frequency plus the 26 single
characters, so every word is segmentable) with BERT's greedy
longest-match-first scan: repeatedly take the longest vocabulary piece
that prefixes the remaining string. Words longer than ``_WP_MAXLEN``
map to a single UNK piece (BERT's ``max_input_chars_per_word`` rule).
The simplification vs production WordPiece: one flat piece vocabulary
(no ``##`` continuation marking) and a frequency-ranked rather than
likelihood-trained vocab — the greedy matcher, the part with actual
algorithmic content, is exact.

Scale design (the 100 TB story):
- Corpus size touches exactly two keyed stages: the word-frequency
  groupBy that ranks the vocab and the distinct-word reduction (both
  partial-aggregatable). The segmentation fold itself runs per
  DISTINCT word as one whole-stage-codegen expression — the ≤154-piece
  vocab is inlined as an array literal (built from a bounded collect,
  like the capped-key lists elsewhere), so there is NO join and NO
  Python in the matcher.
- The per-word piece counts join back to the token stream on the word
  key and aggregate per doc — shuffle bounded by the token stream,
  the same shape as bpe_encode.

Oracle: the DuckDB twin derives the identical vocab in SQL and replays
the identical greedy scan as a recursive CTE (one recursion level per
consumed piece; the longest-prefix choice is a correlated
max-by-length subquery), so the gate checks the whole matcher
bit-for-bit.
"""

from __future__ import annotations

import string

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WP_VOCAB = 128  # top-K corpus words kept as whole pieces
_WP_MAXLEN = 20  # BERT's max_input_chars_per_word rule → UNK

_WP_CACHE: dict = {}


def _wp_fold_expr(vocab: list[str], word_col: str = "word") -> str:
    """The greedy longest-match-first scan as ONE Spark SQL expression:
    fold up to _WP_MAXLEN rounds, each consuming the longest vocab
    piece that prefixes the remainder (ties impossible: two equal-length
    prefixes of one string are equal). Returns the piece count."""
    arr = "array(" + ", ".join("'" + p + "'" for p in sorted(vocab)) + ")"
    best = (
        f"aggregate(filter({arr}, v -> startswith(acc.rem, v)), '', "
        f"(b, v) -> CASE WHEN length(v) > length(b) THEN v ELSE b END)"
    )
    return (
        f"aggregate(sequence(1, {_WP_MAXLEN}), "
        f"named_struct('rem', {word_col}, 'np', 0L), "
        f"(acc, i) -> CASE WHEN acc.rem = '' THEN acc ELSE named_struct("
        f"'rem', substring(acc.rem, length({best}) + 1), "
        f"'np', acc.np + 1L) END, "
        # a word is segmented only if the fold consumed it fully; if no
        # vocab piece ever prefixes the remainder the rounds stall with
        # rem unchanged — emit NULL (the oracle's recursive CTE also
        # never reaches rem = '' there, and SUM skips NULL in both
        # engines), never a fake piece count
        f"acc -> IF(acc.rem = '', acc.np, CAST(NULL AS BIGINT)))"
    )


def _wp_vocab(spark: SparkSession, sf_dir: str) -> list[str]:
    """Top-_WP_VOCAB words by (freq DESC, word ASC) ∪ the 26 single
    characters — a bounded (≤154-row) driver read that becomes the
    matcher's inlined array literal."""
    from trx_spark.queries.curation import _token_stream

    key = (spark, sf_dir)
    if key not in _WP_CACHE:
        top = (
            _token_stream(spark, sf_dir)
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc("token"))
            .limit(_WP_VOCAB)
            .collect()
        )
        vocab = sorted({r["token"] for r in top} | set(string.ascii_lowercase))
        # the no-match NULL in _wp_fold_expr is defensive; with the
        # token alphabet fully covered by single-char pieces it is
        # unreachable, and this guard keeps that true if _TOKEN_RE or
        # the vocab construction ever changes
        assert set(string.ascii_lowercase) <= set(vocab), "vocab must cover [a-z]"
        _WP_CACHE[key] = vocab
    return _WP_CACHE[key]


def wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc WordPiece segmentation stats: (n_tokens, n_pieces,
    n_unk) under greedy longest-match-first against the corpus vocab;
    words over _WP_MAXLEN chars count 1 UNK piece."""
    from trx_spark.queries.curation import _token_stream

    vocab = _wp_vocab(spark, sf_dir)
    toks = _token_stream(spark, sf_dir).select(
        "doc_id", F.col("token").alias("word")
    )
    dw = (
        toks.select("word")
        .distinct()
        .filter(F.length("word") <= _WP_MAXLEN)
        .withColumn("np", F.expr(_wp_fold_expr(vocab)))
    )
    joined = toks.join(dw, "word", "left")
    # over-length words (absent from dw, np NULL) count 1 UNK piece;
    # in-vocab-length words contribute their piece count, which is NULL
    # only in the (guarded-unreachable) no-match case — SUM skips NULL
    # identically in Spark and DuckDB, keeping the engines aligned
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            F.when(F.length("word") > _WP_MAXLEN, F.lit(1)).otherwise(F.col("np"))
        ).alias("n_pieces"),
        F.sum(
            F.when(F.length("word") > _WP_MAXLEN, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_unk"),
    )


_WP_SQL = f"""
WITH RECURSIVE
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS word
  FROM documents
),
topw AS (
  SELECT word FROM (
    SELECT word, COUNT(*) AS c FROM tok GROUP BY word)
  ORDER BY c DESC, word LIMIT {_WP_VOCAB}
),
voc AS (
  SELECT piece FROM topw t(piece)
  UNION
  SELECT chr(CAST(96 + i AS INTEGER))
  FROM UNNEST(generate_series(1, 26)) AS u(i)
),
dw AS (
  SELECT DISTINCT word FROM tok WHERE length(word) <= {_WP_MAXLEN}
),
seg AS (
  SELECT word, word AS rem, 0 AS np FROM dw
  UNION ALL
  SELECT word, substr(rem, length(best) + 1), np + 1
  FROM (
    SELECT s.word, s.rem, s.np,
           (SELECT piece FROM voc
            WHERE starts_with(s.rem, piece)
            ORDER BY length(piece) DESC LIMIT 1) AS best
    FROM seg s WHERE s.rem <> ''
  )
),
wp AS (SELECT word, np FROM seg WHERE rem = '')
SELECT t.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN length(t.word) > {_WP_MAXLEN} THEN 1 ELSE w.np END)
    AS BIGINT) AS n_pieces,
  CAST(SUM(CASE WHEN length(t.word) > {_WP_MAXLEN} THEN 1 ELSE 0 END)
    AS BIGINT) AS n_unk
FROM tok t LEFT JOIN wp w ON t.word = w.word
GROUP BY t.doc_id
"""


QUERIES = {
    "wordpiece_encode": wordpiece_encode,
}

ORACLES = {
    "wordpiece_encode": _WP_SQL,
}
