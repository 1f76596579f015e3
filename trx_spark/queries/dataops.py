"""Data-operations queries a production 100 TB pipeline runs around
the corpus itself: tokenizer-fertility audits, dictionary tagging,
table profiling, and time-series anomaly baselines.

These extend the reference's query surface (the trx reference has no
analogue — it is a beamline-reduction engine) with the operational
staples of an LLM training-data platform:

- ``tokenizer_fertility``: the tokenizer-evaluation metric (tokens per
  whitespace word, bytes per token) computed per source — the number a
  tokenizer-selection study reports (e.g. the fertility tables in the
  XLM-R / BLOOM tokenizer writeups, public knowledge).
- ``dictionary_tag_spans``: broadcast-dictionary phrase tagging with
  positions — the shape of blocklist / PII-term / topic-lexicon
  tagging (an Aho-Corasick pass in single-node pipelines; here the
  corpus-scale formulation is a posting-list equi-join).
- ``table_profile``: the per-column null/distinct/min-max profile every
  data-quality service computes before accepting a drop.
- ``ewma_anomaly``: exponentially-weighted baseline + spike flags over
  per-day event counts — the monitoring query that watches ingest.

Scale design notes (local[32] tests correctness; plans target a
1000-executor cluster):

- ``tokenizer_fertility`` is one map-side projection (two regex/split
  counts per row, JVM codegen) feeding a partial hash-agg on the
  ~constant source dimension: the shuffle carries one row per
  (partition, source). No UDF, no window, no join.
- ``dictionary_tag_spans`` never scans for each term separately and
  never runs a quadratic match: the corpus explodes ONCE into
  positioned bigrams (map-side, derived from the shared tokenization
  memo) and the dictionary — constant-size by construction — broadcasts
  into an equi-join on the bigram text. Work is linear in corpus
  bigrams, independent of dictionary size up to memory. The final
  left join keeps zero-match documents (the common case) without a
  second scan of the match side.
- ``table_profile`` is ONE scan: all per-column aggregates run in a
  single multi-count-distinct aggregate (Catalyst plans the standard
  Expand — one pass over the data, |cols|+1 streams), then the 1-row
  result unpivots driver-free via ``stack``. Exact COUNT(DISTINCT) is
  the correctness-gate choice; the production switch at 100 TB is
  ``approx_count_distinct`` which collapses the Expand into a single
  partial agg (documented, same query shape).
- ``ewma_anomaly`` aggregates events to (type, day) FIRST — bounded by
  types x days, not event volume — then runs one window partitioned on
  event_type (parallel across types, never an unpartitioned sort).
  The EWMA is the bounded 7-lag halving-weight form, so the state per
  row is 7 integers regardless of history length; day gaps are skipped
  (the recurrence runs over observed buckets — the production gap-fill
  switch is a date-dimension left join before the window, same shape).

All arithmetic is integer / fixed-point so the DuckDB oracle reproduces
every cell bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trx_spark.queries.curation import (
    _BPE_RE,
    _P,
    _RARITY_SCALE,
    _TOKEN_RE,
    _bigram_stream,
    _toks_base,
)
from trx_spark.tables import load_table

_FP = 1_000_000  # 1e6 fixed-point scale for ratio outputs

# ---------------------------------------------------------------------
# Tokenizer fertility per source
# ---------------------------------------------------------------------


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer fertility: BPE-ish tokens per whitespace
    word and bytes per token, as 1e-6 fixed point."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0))
    per_doc = docs.select(
        "source",
        ws.cast("long").alias("ws"),
        bpe.cast("long").alias("bpe"),
        F.col("n_chars").alias("nc"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("n_ws_tokens"),
            F.sum("bpe").alias("n_bpe_tokens"),
            F.sum("nc").alias("n_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_ws_tokens",
            "n_bpe_tokens",
            "n_chars",
            F.expr(f"(n_bpe_tokens * {_FP}) DIV n_ws_tokens").alias("fertility_fp"),
            F.expr(f"(n_chars * {_FP}) DIV n_bpe_tokens").alias(
                "bytes_per_token_fp"
            ),
        )
    )


_FERTILITY_SQL = f"""
WITH per_doc AS (
  SELECT source,
    CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS BIGINT)
      AS ws,
    CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS bpe,
    n_chars AS nc
  FROM documents
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
  CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
  CAST(SUM(nc) AS BIGINT) AS n_chars,
  CAST((SUM(bpe) * {_FP}) // SUM(ws) AS BIGINT) AS fertility_fp,
  CAST((SUM(nc) * {_FP}) // SUM(bpe) AS BIGINT) AS bytes_per_token_fp
FROM per_doc GROUP BY source
"""

# ---------------------------------------------------------------------
# Dictionary phrase tagging
# ---------------------------------------------------------------------

# A fixed phrase lexicon (the blocklist / PII-lexicon stand-in). Terms
# are 2-token phrases over the corpus token alphabet; matching is on
# the tokenized stream, so punctuation/spacing variants normalize away
# exactly as both engines' tokenizers do.
_DICT_TERMS = (
    "fast merge",
    "hash value",
    "scan slow",
    "sort table",
    "table part",
    "window table",
)


def dictionary_tag_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag every document with its dictionary-phrase matches: count,
    distinct terms, first match position (1-based token index), and
    the sorted distinct term list."""
    base = _toks_base(spark, sf_dir)
    n = F.size(F.col("toks"))
    positioned = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                i.alias("pos"),
                F.array_join(F.slice(F.col("toks"), i, 2), " ").alias("term"),
            ),
        ),
    )
    pb = base.select("doc_id", F.explode(positioned).alias("s")).select(
        "doc_id", F.col("s.pos").alias("pos"), F.col("s.term").alias("term")
    )
    terms = F.broadcast(
        spark.createDataFrame([(t,) for t in _DICT_TERMS], "term string")
    )
    matches = (
        pb.join(terms, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tags"),
            F.countDistinct("term").alias("n_terms"),
            F.min("pos").cast("long").alias("first_pos"),
            F.array_join(F.sort_array(F.collect_set("term")), ",").alias("terms"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(matches, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_tags"), F.lit(0)).alias("n_tags"),
        F.coalesce(F.col("n_terms"), F.lit(0)).alias("n_terms"),
        "first_pos",
        F.coalesce(F.col("terms"), F.lit("")).alias("terms"),
    )


def _dict_sql() -> str:
    values = ", ".join(f"('{t}')" for t in _DICT_TERMS)
    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE}') AS toks FROM documents
),
pb AS (
  SELECT doc_id, i.pos AS pos, toks[i.pos] || ' ' || toks[i.pos + 1] AS term
  FROM t, UNNEST(generate_series(1, greatest(len(toks) - 1, 0))) AS i(pos)
),
dict AS (SELECT * FROM (VALUES {values}) d(term)),
m AS (
  SELECT doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_tags,
    CAST(COUNT(DISTINCT pb.term) AS BIGINT) AS n_terms,
    CAST(MIN(pos) AS BIGINT) AS first_pos,
    string_agg(DISTINCT pb.term, ',' ORDER BY pb.term) AS terms
  FROM pb JOIN dict USING (term)
  GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(m.n_tags, 0) AS n_tags,
  COALESCE(m.n_terms, 0) AS n_terms,
  m.first_pos,
  COALESCE(m.terms, '') AS terms
FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
"""


# ---------------------------------------------------------------------
# Table profile
# ---------------------------------------------------------------------

_PROFILE_NUM_COLS = ("o_orderkey", "o_custkey", "o_totalprice")
_PROFILE_STR_COLS = ("o_orderstatus", "o_orderpriority")


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile of ``orders``: nulls, exact distinct
    count, min/max (numeric columns as DOUBLE, string columns as-is)."""
    o = load_table(spark, sf_dir, "orders")
    # min/max over a STRING column makes the aggregation buffer
    # variable-width, which forces the whole aggregate (including the
    # countDistinct Expand, x6 rows here) off HashAggregate onto
    # SortAggregate — a full sort of the expanded rows on all six
    # grouping keys.  Splitting the two string min/max pairs into
    # their own keyless pass keeps the big Expand hash-aggregated
    # (no sort anywhere: a grand aggregate needs no ordering), and the
    # two 1-row results recombine with a free 1x1 cross join.
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_NUM_COLS + _PROFILE_STR_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
        ]
    for c in _PROFILE_NUM_COLS:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    str_aggs = []
    for c in _PROFILE_STR_COLS:
        str_aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    row = o.agg(*aggs).crossJoin(o.agg(*str_aggs))
    stacks = []
    for c in _PROFILE_NUM_COLS:
        stacks.append(
            f"'{c}', nn_{c}, nd_{c}, CAST(mn_{c} AS DOUBLE), "
            f"CAST(mx_{c} AS DOUBLE), CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in _PROFILE_STR_COLS:
        stacks.append(
            f"'{c}', nn_{c}, nd_{c}, CAST(NULL AS DOUBLE), "
            f"CAST(NULL AS DOUBLE), mn_{c}, mx_{c}"
        )
    n_cols = len(stacks)
    return row.selectExpr(
        "n_rows",
        f"stack({n_cols}, " + ", ".join(stacks) + ") AS "
        "(column_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)",
    ).select(
        "column_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


def _profile_sql() -> str:
    legs = []
    for c in _PROFILE_NUM_COLS:
        legs.append(f"""
SELECT '{c}' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
  CAST(MIN({c}) AS DOUBLE) AS min_num, CAST(MAX({c}) AS DOUBLE) AS max_num,
  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM orders""")
    for c in _PROFILE_STR_COLS:
        legs.append(f"""
SELECT '{c}' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
  MIN({c}) AS min_str, MAX({c}) AS max_str
FROM orders""")
    return " UNION ALL ".join(legs)


# ---------------------------------------------------------------------
# EWMA anomaly baseline over daily event counts
# ---------------------------------------------------------------------

_DAY_US = 86_400_000_000
# halving weights for lags 1..7 (most recent first); >= 3 observed lags
# (weight mass >= 112/127) required before flagging
_EWMA_W = (64, 32, 16, 8, 4, 2, 1)
_EWMA_MIN_DEN = 112


def ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, day): event count, 7-lag halving-weight EWMA
    baseline (as numerator/denominator integers), and a spike flag when
    the count exceeds 2x the weighted-history mean."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"(ts_ns DIV 1000) DIV {_DAY_US}").alias("day")
    )
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lags = [F.lag("n_events", k + 1).over(w) for k in range(len(_EWMA_W))]
    num = sum(
        (F.coalesce(lag, F.lit(0)) * F.lit(wk) for lag, wk in zip(lags, _EWMA_W)),
        F.lit(0),
    )
    den = sum(
        (F.when(lag.isNull(), 0).otherwise(wk) for lag, wk in zip(lags, _EWMA_W)),
        F.lit(0),
    )
    with_base = counts.select(
        "event_type",
        "day",
        "n_events",
        num.cast("long").alias("baseline_num"),
        den.cast("long").alias("baseline_den"),
    )
    flag = F.when(
        F.col("baseline_den") >= _EWMA_MIN_DEN,
        (
            F.col("n_events") * F.col("baseline_den")
            > 2 * F.col("baseline_num")
        ).cast("int"),
    )
    return with_base.select(
        "event_type", "day", "n_events", "baseline_num", "baseline_den",
        flag.alias("is_anomaly"),
    )


def _ewma_sql() -> str:
    lag_num = " + ".join(
        f"COALESCE(lag(n_events, {k + 1}) OVER w, 0) * {wk}"
        for k, wk in enumerate(_EWMA_W)
    )
    lag_den = " + ".join(
        f"CASE WHEN lag(n_events, {k + 1}) OVER w IS NULL THEN 0 ELSE {wk} END"
        for k, wk in enumerate(_EWMA_W)
    )
    return f"""
WITH counts AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, epoch_us(ts) // {_DAY_US}
),
base AS (
  SELECT event_type, day, n_events,
    CAST({lag_num} AS BIGINT) AS baseline_num,
    CAST({lag_den} AS BIGINT) AS baseline_den
  FROM counts
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type, day, n_events, baseline_num, baseline_den,
  CASE WHEN baseline_den >= {_EWMA_MIN_DEN}
       THEN CAST(n_events * baseline_den > 2 * baseline_num AS INTEGER)
       END AS is_anomaly
FROM base
"""


# ---------------------------------------------------------------------
# Pearson correlation matrix between event-type day series
# ---------------------------------------------------------------------
#
# The co-movement monitor: which event streams rise and fall together
# day-over-day. Sufficient statistics (n, Sx, Sy, Sxx, Syy, Sxy) are
# exact BIGINTs over the COMPLETE day x type grid (absent buckets count
# as zero — a day a type went silent is signal, not a missing row);
# the final r is two IEEE sqrt calls and one division over those exact
# integers, so both engines agree to the last bit. The grid build is a
# |days| x |types| broadcast nested loop — bounded by the type
# cardinality, never corpus-quadratic (allowlisted like
# rolling_active_users' day dim); the pair join is day-keyed with
# |types|^2 fan-out per day.


def event_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of daily event counts per type."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"(ts_ns DIV 1000) DIV {_DAY_US}").alias("day")
    )
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("c")
    )
    days = counts.select("day").distinct()
    types = counts.select("event_type").distinct()
    full = (
        days.crossJoin(F.broadcast(types))
        .join(counts, ["event_type", "day"], "left")
        .select(
            "event_type", "day", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
        .localCheckpoint()
    )
    a, b = full.alias("a"), full.alias("b")
    pairs = a.join(
        b,
        (F.col("a.day") == F.col("b.day"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    )
    stats = pairs.groupBy(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("a.c")).alias("sx"),
        F.sum(F.col("b.c")).alias("sy"),
        F.sum(F.col("a.c") * F.col("a.c")).alias("sxx"),
        F.sum(F.col("b.c") * F.col("b.c")).alias("syy"),
        F.sum(F.col("a.c") * F.col("b.c")).alias("sxy"),
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")
    return stats.select(
        "type_a", "type_b", "n_days", "sx", "sy", "sxy",
        (
            num.cast("double")
            / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double")))
        ).alias("corr"),
    )


_CORR_SQL = f"""
WITH counts AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, epoch_us(ts) // {_DAY_US}
),
grid AS (
  SELECT t.event_type, d.day, COALESCE(c.c, 0) AS c
  FROM (SELECT DISTINCT day FROM counts) d
  CROSS JOIN (SELECT DISTINCT event_type FROM counts) t
  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day
),
stats AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    CAST(COUNT(*) AS BIGINT) AS n_days,
    CAST(SUM(a.c) AS BIGINT) AS sx,
    CAST(SUM(b.c) AS BIGINT) AS sy,
    CAST(SUM(a.c * a.c) AS BIGINT) AS sxx,
    CAST(SUM(b.c * b.c) AS BIGINT) AS syy,
    CAST(SUM(a.c * b.c) AS BIGINT) AS sxy
  FROM grid a JOIN grid b
    ON a.day = b.day AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT type_a, type_b, n_days, sx, sy, sxy,
  CAST(n_days * sxy - sx * sy AS DOUBLE)
    / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
       * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))) AS corr
FROM stats
"""

# ---------------------------------------------------------------------
# Winsorized (trimmed) doc-length statistics per source
# ---------------------------------------------------------------------
#
# The robust-mean the quality dashboard wants when a source has a few
# pathological giants: clamp n_chars into [floor(p10), ceil(p90)]
# before averaging. Exact percentile is the gate choice
# (quantile_cont bit-equality, the repo-wide contract);
# approx_percentile is the production switch. The integer floor/ceil
# of the cuts keeps the clamped sum an exact BIGINT.


def trimmed_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: raw vs 10-90% winsorized mean doc length (1e-6
    fixed point), with the integer clamp bounds."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    cuts = docs.groupBy("source").agg(
        F.floor(F.expr("percentile(n_chars, 0.1)")).alias("lo"),
        F.ceil(F.expr("percentile(n_chars, 0.9)")).alias("hi"),
    )
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("n_chars")))
    return (
        docs.join(cuts, "source")
        .groupBy("source", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("raw_sum"),
            F.sum(clamped).alias("trimmed_sum"),
        )
        .select(
            "source", "lo", "hi", "n_docs", "raw_sum", "trimmed_sum",
            F.expr(f"(raw_sum * {_FP}) DIV n_docs").alias("raw_mean_fp"),
            F.expr(f"(trimmed_sum * {_FP}) DIV n_docs").alias(
                "trimmed_mean_fp"
            ),
        )
    )


_TRIMMED_SQL = f"""
WITH cuts AS (
  SELECT source,
    CAST(floor(quantile_cont(n_chars, 0.1)) AS BIGINT) AS lo,
    CAST(ceil(quantile_cont(n_chars, 0.9)) AS BIGINT) AS hi
  FROM documents GROUP BY source
)
SELECT d.source, lo, hi,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS raw_sum,
  CAST(SUM(greatest(lo, least(hi, n_chars))) AS BIGINT) AS trimmed_sum,
  CAST((SUM(n_chars) * {_FP}) // COUNT(*) AS BIGINT) AS raw_mean_fp,
  CAST((SUM(greatest(lo, least(hi, n_chars))) * {_FP}) // COUNT(*) AS BIGINT)
    AS trimmed_mean_fp
FROM documents d JOIN cuts USING (source)
GROUP BY d.source, lo, hi
"""


# ---------------------------------------------------------------------
# CCNet-style quality tiers (head / middle / tail)
# ---------------------------------------------------------------------
#
# CCNet (Wenzek et al. 2019, public) buckets a crawl into head/middle/
# tail thirds by LM perplexity and trains preferentially on the head.
# The repo's oracle-exact perplexity proxy is the mean inverse bigram
# frequency (bigram_rarity's integer score: common phrasing scores
# low = "head"); the cuts are the exact 33/67 percentiles of that
# score. One global 1-row cut frame broadcasts into the scored stream
# (the curriculum_phases pattern); everything else is the shared
# bigram-stream memo plus two keyed aggs.


def ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, head|middle|tail): doc count and the integer score
    span, with tiers cut at the exact global 33/67 percentiles of the
    mean-inverse-bigram-frequency score."""
    db = _bigram_stream(spark, sf_dir)
    freqs = db.groupBy("ngram").agg(F.count(F.lit(1)).alias("freq"))
    inv = F.floor(
        F.lit(float(_RARITY_SCALE)) / F.col("freq").cast("double")
    ).cast("long")
    scored = (
        db.join(freqs, "ngram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum(inv).alias("rarity_fp"),
        )
        .select(
            "doc_id", F.expr("rarity_fp DIV nb").alias("score")
        )
    )
    cuts = scored.agg(
        F.expr("percentile(score, 0.33)").alias("p33"),
        F.expr("percentile(score, 0.67)").alias("p67"),
    )
    bucket = (
        F.when(F.col("score").cast("double") <= F.col("p33"), "head")
        .when(F.col("score").cast("double") <= F.col("p67"), "middle")
        .otherwise("tail")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        scored.crossJoin(F.broadcast(cuts))
        .join(docs, "doc_id")
        .groupBy("source", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score").alias("score_min"),
            F.max("score").alias("score_max"),
        )
    )


_CCNET_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE}') AS toks FROM documents
),
db AS (
  SELECT doc_id, b.ngram
  FROM t, UNNEST(list_transform(
      generate_series(1, greatest(len(toks) - 1, 0)),
      i -> toks[i] || ' ' || toks[i+1])) AS b(ngram)
),
freqs AS (
  SELECT ngram, CAST(COUNT(*) AS BIGINT) AS freq FROM db GROUP BY ngram
),
scored AS (
  SELECT db.doc_id,
    CAST(SUM(CAST(FLOOR(CAST({_RARITY_SCALE} AS DOUBLE)
                        / CAST(freq AS DOUBLE)) AS BIGINT)) AS BIGINT)
      // CAST(COUNT(*) AS BIGINT) AS score
  FROM db JOIN freqs USING (ngram)
  GROUP BY db.doc_id
),
cuts AS (
  SELECT quantile_cont(score, 0.33) AS p33,
         quantile_cont(score, 0.67) AS p67
  FROM scored
)
SELECT source,
  CASE WHEN CAST(score AS DOUBLE) <= p33 THEN 'head'
       WHEN CAST(score AS DOUBLE) <= p67 THEN 'middle'
       ELSE 'tail' END AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(MIN(score) AS BIGINT) AS score_min,
  CAST(MAX(score) AS BIGINT) AS score_max
FROM scored CROSS JOIN cuts JOIN documents USING (doc_id)
GROUP BY source, bucket
"""


# ---------------------------------------------------------------------
# Theil–Sen robust trend per event-type day series
# ---------------------------------------------------------------------
#
# The robust slope estimator (median of pairwise slopes — Theil 1950 /
# Sen 1968, public): immune to the outlier days that wreck a
# least-squares trend. Day-pair enumeration is bounded by |days|² per
# type — a dimension-table product, never event-volume-quadratic; the
# slopes are exact integer differences divided once (IEEE double), and
# the median is the repo's exact-percentile contract.


def event_trend_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: Theil–Sen slope (events/day per day) of the
    daily count series over the complete day grid."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"(ts_ns DIV 1000) DIV {_DAY_US}").alias("day")
    )
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("c")
    )
    days = counts.select("day").distinct()
    types = counts.select("event_type").distinct()
    full = (
        days.crossJoin(F.broadcast(types))
        .join(counts, ["event_type", "day"], "left")
        .select(
            "event_type", "day", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
        .localCheckpoint()
    )
    a, b = full.alias("a"), full.alias("b")
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("a.day") < F.col("b.day"))
        .select(
            "event_type",
            (
                (F.col("b.c") - F.col("a.c")).cast("double")
                / (F.col("b.day") - F.col("a.day")).cast("double")
            ).alias("slope"),
        )
    )
    return slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("trend_slope"),
    )


_TREND_SQL = f"""
WITH counts AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, epoch_us(ts) // {_DAY_US}
),
grid AS (
  SELECT t.event_type, d.day, COALESCE(c.c, 0) AS c
  FROM (SELECT DISTINCT day FROM counts) d
  CROSS JOIN (SELECT DISTINCT event_type FROM counts) t
  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day
),
slopes AS (
  SELECT a.event_type,
    CAST(b.c - a.c AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
  FROM grid a JOIN grid b
    ON a.event_type = b.event_type AND a.day < b.day
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  quantile_cont(slope, 0.5) AS trend_slope
FROM slopes GROUP BY event_type
"""

# ---------------------------------------------------------------------
# Deterministic multinomial bootstrap (replica means)
# ---------------------------------------------------------------------
#
# Bootstrap uncertainty for a corpus statistic, shaped for an engine:
# replica r's sample is slot s -> doc ((s+1)(r+7)·2654435761 mod P
# mod n) — sampling WITH replacement through an arithmetic mix both
# engines evaluate identically, so every replica mean is
# oracle-hashable. n docs arrive as a 1-row broadcast; the grid is a
# constant B-way map-side explode (never data×data); the resample is
# one equi-join on doc_id. At 100 TB the standard spelling is the
# POISSON bootstrap (per-row Poisson(1) replica weights — no dense-id
# requirement, no join); this multinomial twin is the exact-gate
# variant, and the mix would move to 128-bit modmul at huge n.

_BOOT_B = 32
_BOOT_MIX = 2_654_435_761  # Knuth multiplicative-hash constant


def bootstrap_replica_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B=32 bootstrap replicas of mean doc length: per replica, the
    resampled doc count and the 1e-6 fixed-point mean of n_chars."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    n1 = docs.agg(F.count(F.lit(1)).alias("n"))
    grid = (
        docs.select(F.col("doc_id").alias("slot"))
        .crossJoin(F.broadcast(n1))
        .select(
            "slot",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias(
                "rep_i"
            ),
        )
        .select(
            F.col("rep_i").cast("long").alias("replica"),
            "slot",
            "n",
        )
        .select(
            "replica",
            (
                (F.col("slot") + 1)
                * (F.col("replica") + 7)
                * F.lit(_BOOT_MIX)
                % F.lit(_P)
                % F.col("n")
            ).alias("chosen"),
        )
    )
    return (
        grid.join(docs, grid.chosen == docs.doc_id)
        .groupBy("replica")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "replica",
            "n_sampled",
            "sum_chars",
            F.expr(f"(sum_chars * {_FP}) DIV n_sampled").alias("mean_fp"),
        )
    )


_BOOT_SQL = f"""
WITH n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
grid AS (
  SELECT r.replica,
    ((d.doc_id + 1) * (r.replica + 7) * {_BOOT_MIX}) % {_P} % n1.n AS chosen
  FROM documents d
  CROSS JOIN n1
  CROSS JOIN (SELECT UNNEST(generate_series(0, {_BOOT_B - 1})) AS replica) r
)
SELECT replica,
  CAST(COUNT(*) AS BIGINT) AS n_sampled,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
  CAST((SUM(n_chars) * {_FP}) // COUNT(*) AS BIGINT) AS mean_fp
FROM grid JOIN documents ON chosen = doc_id
GROUP BY replica
"""


# ---------------------------------------------------------------------
# Moving median + day-of-week seasonality over the event day series
# ---------------------------------------------------------------------
#
# The two remaining monitoring companions to ewma_anomaly /
# event_trend_robust: a 7-day trailing MEDIAN (robust smoother — the
# windowed exact-percentile shape, deterministic because (type, day)
# rows are unique) and the day-of-week profile (seasonality baseline:
# per (type, dow) mean and the peak flag). Both run entirely on the
# pre-collapsed (type, day) grid — bounded by types × days, never
# event volume.


def moving_median_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, day): the daily count and its trailing 7-row
    exact median (including the current day)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"(ts_ns DIV 1000) DIV {_DAY_US}").alias("day")
    )
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return counts.select(
        "event_type",
        "day",
        "n_events",
        F.expr("percentile(n_events, 0.5)").over(w).alias("median_7d"),
    )


_MOVING_MEDIAN_SQL = f"""
WITH counts AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, epoch_us(ts) // {_DAY_US}
)
SELECT event_type, day, n_events,
  quantile_cont(n_events, 0.5) OVER (
    PARTITION BY event_type ORDER BY day
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS median_7d
FROM counts
"""


def seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, day-of-week): observed days, total and 1e-6
    fixed-point mean daily count, and whether this is the type's peak
    weekday (deterministic min-dow tie-break)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"(ts_ns DIV 1000) DIV {_DAY_US}").alias("day")
    )
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    prof = counts.groupBy(
        "event_type", (F.col("day") % 7).alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("total_events"),
    ).select(
        "event_type",
        "dow",
        "n_days",
        "total_events",
        F.expr(f"(total_events * {_FP}) DIV n_days").alias("mean_fp"),
    )
    # peak weekday: portable argmax (max join-back + MIN dow tie-break)
    peak = (
        prof.groupBy("event_type")
        .agg(F.max("mean_fp").alias("max_mean"))
        .join(prof, "event_type")
        .filter(F.col("mean_fp") == F.col("max_mean"))
        .groupBy("event_type")
        .agg(F.min("dow").alias("peak_dow"))
    )
    return prof.join(peak, "event_type").select(
        "event_type",
        "dow",
        "n_days",
        "total_events",
        "mean_fp",
        (F.col("dow") == F.col("peak_dow")).cast("int").alias("is_peak"),
    )


_SEASONALITY_SQL = f"""
WITH counts AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, epoch_us(ts) // {_DAY_US}
),
prof AS (
  SELECT event_type, day % 7 AS dow,
    CAST(COUNT(*) AS BIGINT) AS n_days,
    CAST(SUM(n_events) AS BIGINT) AS total_events,
    CAST((SUM(n_events) * {_FP}) // COUNT(*) AS BIGINT) AS mean_fp
  FROM counts GROUP BY event_type, day % 7
),
mx AS (SELECT event_type, MAX(mean_fp) AS max_mean FROM prof GROUP BY event_type),
peak AS (
  SELECT prof.event_type, MIN(dow) AS peak_dow
  FROM prof JOIN mx ON prof.event_type = mx.event_type
                   AND prof.mean_fp = mx.max_mean
  GROUP BY prof.event_type
)
SELECT prof.event_type, dow, n_days, total_events, mean_fp,
  CAST(dow = peak_dow AS INTEGER) AS is_peak
FROM prof JOIN peak ON prof.event_type = peak.event_type
"""


# ---------------------------------------------------------------------
# Classical OLS trend per event series (the Theil–Sen companion)
# ---------------------------------------------------------------------


def ols_trend_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: ordinary-least-squares slope and intercept of
    the daily count series, from exact integer sufficient statistics
    (n, Σx, Σy, Σx², Σxy over (day_index, daily_count) — all BIGINTs),
    with the slope/intercept as IEEE arithmetic over those integers.
    Paired with ``event_trend_robust`` (Theil–Sen) this gives the
    classical + robust trend pair every monitoring stack carries; a
    large gap between the two flags outlier days.

    Plan: one (type, day) collapse of the stream (the only data-scale
    stage), one per-type aggregate over the bounded day grid — no
    joins, no window."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr(f"(ts_ns DIV 1000) DIV {_DAY_US}").alias("day")
    )
    counts = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("c")
    )
    base = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("day").alias("sx"),
        F.sum("c").alias("sy"),
        F.sum(F.col("day") * F.col("day")).alias("sxx"),
        F.sum(F.col("day") * F.col("c")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    den = nd * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx").cast("double")
    slope = num / den
    return base.select(
        "event_type",
        "n",
        "sx",
        "sy",
        "sxx",
        "sxy",
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / nd
        ).alias("intercept"),
    )


_OLS_SQL = f"""
WITH counts AS (
  SELECT event_type, epoch_ns(ts) // 1000 // {_DAY_US} AS day,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(day) AS BIGINT) AS sx,
    CAST(SUM(c) AS BIGINT) AS sy,
    CAST(SUM(day * day) AS BIGINT) AS sxx,
    CAST(SUM(day * c) AS BIGINT) AS sxy
  FROM counts GROUP BY event_type
)
SELECT event_type, n, sx, sy, sxx, sxy,
  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
  (CAST(sy AS DOUBLE)
   - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
     * CAST(sx AS DOUBLE))
  / CAST(n AS DOUBLE) AS intercept
FROM base
"""

QUERIES = {
    "tokenizer_fertility": tokenizer_fertility,
    "ols_trend_stats": ols_trend_stats,
    "dictionary_tag_spans": dictionary_tag_spans,
    "table_profile": table_profile,
    "ewma_anomaly": ewma_anomaly,
    "event_type_correlation": event_type_correlation,
    "trimmed_length_stats": trimmed_length_stats,
    "ccnet_quality_buckets": ccnet_quality_buckets,
    "event_trend_robust": event_trend_robust,
    "bootstrap_replica_means": bootstrap_replica_means,
    "moving_median_counts": moving_median_counts,
    "seasonality_profile": seasonality_profile,
}

ORACLES = {
    "tokenizer_fertility": _FERTILITY_SQL,
    "dictionary_tag_spans": _dict_sql(),
    "table_profile": _profile_sql(),
    "ewma_anomaly": _ewma_sql(),
    "event_type_correlation": _CORR_SQL,
    "trimmed_length_stats": _TRIMMED_SQL,
    "ccnet_quality_buckets": _CCNET_SQL,
    "event_trend_robust": _TREND_SQL,
    "ols_trend_stats": _OLS_SQL,
    "bootstrap_replica_means": _BOOT_SQL,
    "moving_median_counts": _MOVING_MEDIAN_SQL,
    "seasonality_profile": _SEASONALITY_SQL,
}
