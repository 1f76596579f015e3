"""Exact substring deduplication + readability sufficient statistics
(LLM-pipeline extension; no reference counterpart).

``duplicate_ngram_spans`` is the relational core of exact-substring
training-data dedup (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022 — there via a corpus suffix array;
here the equivalent fixed-window formulation): every length-``_DUP_W``
token window that occurs more than once in the corpus is a duplicated
window, and maximal runs of consecutive duplicated window starts merge
into removable spans, exactly the merge step the suffix-array pipeline
performs on its matches.

Scale design (the 100 TB story):
- The window stream is a per-row ``transform``/``explode`` (map-side,
  ~W x token count rows, no shuffle); the duplicate test is ONE
  partial-aggregatable groupBy on the window text, and the join back
  is keyed on the same column — no all-pairs stage anywhere. At
  petabyte scale the gram key would be ``xxhash64(gram)`` to shrink
  shuffle bytes (collision-free in expectation at 64 bits); the gate
  keeps the raw string because the DuckDB oracle must reproduce the
  key bit-for-bit.
- Span merging is a gaps-and-islands pass: one per-doc window function
  (bounded by document length, the same partitioning every other
  per-doc operator uses) + two keyed aggregations.

``readability_stats`` emits the INTEGER sufficient statistics of the
classic readability indices (sentence count, word count, long-word
count, word characters, vowel-group syllable proxy) so the driver can
hash them exactly; the two derived ratios are exact-integer divisions
in IEEE double (bit-identical across engines, the bpe_encode
precedent). Flesch/ARI/LIX are affine maps of these columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_DUP_W = 5  # duplicated-window width in tokens (mirrored in the oracle)
_LONG_WORD = 7  # LIX long-word threshold (chars)

_TOKEN_RE = "[a-z]+"
_SENT_RE = "[.!?]+"
_VOWEL_RE = "[aeiou]+"


def _window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, gram): every _DUP_W-token window, 1-based start.
    Gated on n >= _DUP_W — Spark's sequence(1, 0) is DESCENDING, not
    empty (the _shingled footgun, curation.py:84)."""
    from trx_spark.queries.curation import _toks_base

    base = _toks_base(spark, sf_dir)
    n = F.size(F.col("toks"))
    wins = F.when(
        n >= _DUP_W,
        F.transform(
            F.sequence(F.lit(1), n - (_DUP_W - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.array_join(F.slice(F.col("toks"), i, _DUP_W), " ").alias("gram"),
            ),
        ),
    )
    return base.select("doc_id", F.explode(wins).alias("w")).select(
        "doc_id", F.col("w.pos").alias("pos"), F.col("w.gram").alias("gram")
    )


def duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc with at least one duplicated window: (n_dup_windows,
    n_spans, dup_tokens) where spans are maximal runs of consecutive
    duplicated window starts and dup_tokens counts the tokens those
    spans cover (run + W - 1 each)."""
    w = _window_stream(spark, sf_dir)
    dup_grams = (
        w.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") >= 2)
        .select("gram")
    )
    dup = w.join(dup_grams, "gram")  # keyed, no fan-out: occ filter done
    isl = F.col("pos") - F.row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")
    )
    spans = (
        dup.withColumn("isl", isl)
        .groupBy("doc_id", "isl")
        .agg(
            F.min("pos").alias("s"),
            F.max("pos").alias("e"),
            F.count(F.lit(1)).alias("nw"),
        )
    )
    return spans.groupBy("doc_id").agg(
        F.sum("nw").alias("n_dup_windows"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + F.lit(_DUP_W)).alias("dup_tokens"),
    )


_DUP_SPANS_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE}') AS toks
  FROM documents
),
w AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(toks[u.i:u.i + {_DUP_W - 1}], ' ') AS gram
  FROM t, UNNEST(generate_series(1, len(toks) - {_DUP_W - 1})) AS u(i)
),
g AS (SELECT gram FROM w GROUP BY gram HAVING COUNT(*) >= 2),
d AS (SELECT w.doc_id, w.pos FROM w JOIN g USING (gram)),
i AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM d
),
s AS (
  SELECT doc_id, isl, MIN(pos) AS s, MAX(pos) AS e, COUNT(*) AS nw
  FROM i GROUP BY doc_id, isl
)
SELECT doc_id,
       CAST(SUM(nw) AS BIGINT) AS n_dup_windows,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(e - s + {_DUP_W}) AS BIGINT) AS dup_tokens
FROM s GROUP BY doc_id
"""


def readability_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc readability sufficient statistics: sentence/word/
    long-word/character/vowel-group counts (all exact integers) plus
    the two derived ratios every classic index is an affine map of.

    Deliberately a SINGLE map-only pass over ``documents`` (re-running
    the token regex rather than reusing the memoized _toks_base
    checkpoint): a per-doc scalar query must not pay a corpus-wide
    doc_id join — at sf0.1 AQE would broadcast one side, but at 100 TB
    both sides are corpus-sized and the join becomes a full shuffle.
    Zero exchanges; whole-stage-codegen end to end."""
    from trx_spark.tables import fan_out_small_scan, load_table

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    toks = F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE), 0)
    out = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_SENT_RE), 0))
        .cast("long")
        .alias("n_sentences"),
        toks.alias("toks"),
    ).select(
        "doc_id",
        "n_sentences",
        F.size("toks").cast("long").alias("n_words"),
        F.size(F.expr(f"filter(toks, t -> length(t) >= {_LONG_WORD})"))
        .cast("long")
        .alias("n_long_words"),
        F.expr("aggregate(toks, 0L, (a, x) -> a + length(x))").alias(
            "n_word_chars"
        ),
        F.expr(
            f"aggregate(toks, 0L, (a, x) -> "
            f"a + size(regexp_extract_all(x, '{_VOWEL_RE}', 0)))"
        ).alias("n_vowel_groups"),
    )
    return out.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_long_words",
        "n_word_chars",
        "n_vowel_groups",
        F.when(
            F.col("n_words") > 0,
            F.col("n_word_chars").cast("double") / F.col("n_words").cast("double"),
        ).alias("chars_per_word"),
        F.when(
            F.col("n_sentences") > 0,
            F.col("n_words").cast("double") / F.col("n_sentences").cast("double"),
        ).alias("words_per_sentence"),
    )


_READABILITY_SQL = f"""
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(text, '{_TOKEN_RE}') AS toks,
         CAST(len(regexp_extract_all(text, '{_SENT_RE}')) AS BIGINT)
           AS n_sentences
  FROM documents
)
SELECT doc_id,
  n_sentences,
  CAST(len(toks) AS BIGINT) AS n_words,
  CAST(len(list_filter(toks, t -> length(t) >= {_LONG_WORD})) AS BIGINT)
    AS n_long_words,
  CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)
    AS BIGINT) AS n_word_chars,
  CAST(COALESCE(list_sum(list_transform(toks,
         t -> len(regexp_extract_all(t, '{_VOWEL_RE}')))), 0)
    AS BIGINT) AS n_vowel_groups,
  CASE WHEN len(toks) > 0 THEN
    CAST(COALESCE(list_sum(list_transform(toks, t -> length(t))), 0)
      AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS chars_per_word,
  CASE WHEN n_sentences > 0 THEN
    CAST(len(toks) AS DOUBLE) / CAST(n_sentences AS DOUBLE) END
    AS words_per_sentence
FROM t
"""


# ---------------------------------------------------------------------
# S-stemmer vocabulary folding (Harman, "How effective is suffixing?",
# JASIS 1991): the three ordered plural-stripping rules, each with its
# exception list; only the first APPLICABLE rule fires (a rule whose
# exception blocks it falls through — the paper's reading).  The whole
# stemmer is ONE shared CASE/LIKE/substr expression string (no
# lookbehind — DuckDB's RE2 has none, so regex is avoided entirely),
# parsed identically by Spark SQL and DuckDB.
# ---------------------------------------------------------------------

_SSTEM_EXPR = """CASE
  WHEN {w} LIKE '%ies' AND {w} NOT LIKE '%eies' AND {w} NOT LIKE '%aies'
    THEN substr({w}, 1, length({w}) - 3) || 'y'
  WHEN {w} LIKE '%es' AND {w} NOT LIKE '%aes' AND {w} NOT LIKE '%ees'
       AND {w} NOT LIKE '%oes'
    THEN substr({w}, 1, length({w}) - 1)
  WHEN {w} LIKE '%s' AND {w} NOT LIKE '%us' AND {w} NOT LIKE '%ss'
    THEN substr({w}, 1, length({w}) - 1)
  ELSE {w} END"""


# the corpus vocabulary carries no plural morphology (31 root words, no
# s-endings), so the gate stems a DERIVED word table instead: corpus
# roots × a fixed suffix set covering every rule and every exception —
# the HLL "gate checks the CONSTRUCTION bit-exactly" precedent.  The
# bounded generator (|vocab| × 8 literal suffixes) is the _CARTESIAN_OK
# fixture shape, never data⨯data.
_SSTEM_SUFFIXES = ("", "s", "es", "ies", "ss", "us", "oes", "aies")


def sstem_rule_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-stemmer rule census over corpus-root × suffix derived words:
    per suffix, how many derived words exist, how many the stemmer
    changed, how many distinct stems result, and how many fold back to
    their bare root — pinning the fire/block behavior of every rule
    and every exception against real vocabulary roots.

    Scale shape: one vocabulary-sized distinct (the shuffle every
    vocab statistic pays), then a map-side explode of an 8-element
    literal suffix array and one partial-aggregatable groupBy."""
    from trx_spark.queries.curation import _token_stream

    roots = _token_stream(spark, sf_dir).select("token").distinct()
    sufs = F.array(*[F.lit(s) for s in _SSTEM_SUFFIXES])
    words = roots.select(
        F.col("token").alias("root"), F.explode(sufs).alias("suffix")
    ).withColumn("word", F.concat(F.col("root"), F.col("suffix")))
    stem = F.expr(_SSTEM_EXPR.format(w="word"))
    scored = words.withColumn("stem", stem)
    return scored.groupBy("suffix").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum((F.col("stem") != F.col("word")).cast("long")).alias("n_changed"),
        F.countDistinct("stem").alias("n_stems"),
        F.sum((F.col("stem") == F.col("root")).cast("long")).alias(
            "n_folded_to_root"
        ),
    )


_SSTEM_SUFFIX_SQL = "[" + ", ".join(f"'{s}'" for s in _SSTEM_SUFFIXES) + "]"

_SSTEM_SQL = f"""
WITH roots AS (
  SELECT DISTINCT t AS root FROM (
    SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS t FROM documents
  )
),
words AS (
  SELECT root, suffix, root || suffix AS word
  FROM roots, (SELECT unnest({_SSTEM_SUFFIX_SQL}) AS suffix)
),
scored AS (
  SELECT root, suffix, word, ({_SSTEM_EXPR.format(w="word")}) AS stem
  FROM words
)
SELECT suffix, CAST(COUNT(*) AS BIGINT) AS n_words,
  CAST(SUM(CASE WHEN stem <> word THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
  CAST(COUNT(DISTINCT stem) AS BIGINT) AS n_stems,
  CAST(SUM(CASE WHEN stem = root THEN 1 ELSE 0 END) AS BIGINT)
    AS n_folded_to_root
FROM scored GROUP BY suffix
"""


QUERIES = {
    "duplicate_ngram_spans": duplicate_ngram_spans,
    "readability_stats": readability_stats,
    "sstem_rule_census": sstem_rule_census,
}

ORACLES = {
    "duplicate_ngram_spans": _DUP_SPANS_SQL,
    "readability_stats": _READABILITY_SQL,
    "sstem_rule_census": _SSTEM_SQL,
}
