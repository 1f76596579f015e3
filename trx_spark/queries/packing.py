"""Training-set assembly operators: PII scrubbing, fixed-budget
sequence packing, and the deterministic epoch shuffle — the last mile
between a curated corpus and a training run.

Scale design notes (local[32] tests correctness; the plans target a
1000-executor cluster):

- ``pii_scrub``: pure per-row regexp column math (JVM-side, whole-stage
  codegen) — zero shuffles; the scrub of a 100 TB corpus is one scan.
  The PII spans are synthesized deterministically from doc_id (the
  testdata has none — same pattern as ``delay_codec``'s synthetic delay
  strings), so the redaction counts are oracle-checkable.
- ``pack_sequences``: the concat-and-chunk step packs documents into
  fixed-token-budget training sequences. The cumulative token count is
  a window PARTITIONED BY the pack shard (doc_id mod _N_PACK_SHARDS) —
  production packing is per-shard/per-worker by design (a global pack
  order would serialize the corpus through one task AND create a
  cross-file dependency chain no resumable writer wants), so the plan
  holds at any scale: one shuffle on the shard key, O(shard) windows.
- ``epoch_shuffle``: training-order permutation as pure arithmetic — an
  affine hash of (doc_id, epoch) picks the shard and the rank within
  the shard. Reproducible across engines, retries, and partitionings
  (no RNG state), which is exactly what makes a 100 TB shuffle
  resumable: any executor can recompute its shard's order from doc_ids
  alone. One shuffle on (epoch, shard); windows never global.

All arithmetic is integer / fixed-point, so the DuckDB oracle matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trx_spark.queries.curation import _BPE_RE, _P, _SAMPLE_A, _SAMPLE_B
from trx_spark.tables import fan_out_small_scan, load_table

# ---------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------
#
# Redaction categories follow the public pipeline playbooks (e.g. the
# BigCode/StarCoder PII pass): emails and phone numbers replaced with
# typed placeholder tokens. Patterns are ASCII-class-only so Java
# util.regex (Spark) and RE2 (DuckDB) agree byte-for-byte.

_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+"
_PHONE_RE = "\\+[0-9]{2}-[0-9]{3}-[0-9]{4}"


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub synthesized PII from documents; report per-doc counts.

    doc_id % 3 email spans and doc_id % 2 phone spans are appended to
    the text (deterministic, so the oracle reproduces them), then both
    regexes redact to ``<EMAIL>`` / ``<PHONE>``. Zero shuffles.
    """
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    email_span = F.concat(
        F.lit(" user"), F.col("doc_id").cast("string"), F.lit("@example.com")
    )
    phone_span = F.concat(
        F.lit(" +01-555-"), (F.col("doc_id") % 9000 + 1000).cast("string")
    )
    n_e = F.col("doc_id") % 3
    n_p = F.col("doc_id") % 2
    aug = F.concat(
        F.col("text"),
        F.when(n_e >= 1, email_span).otherwise(F.lit("")),
        F.when(n_e >= 2, email_span).otherwise(F.lit("")),
        F.when(n_p >= 1, phone_span).otherwise(F.lit("")),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(_PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.length(scrubbed).cast("long").alias("clean_len"),
        F.md5(scrubbed.cast("binary")).alias("clean_hash"),
    )


_PII_SQL = f"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 >= 1
            THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 3 >= 2
            THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 2 >= 1
            THEN ' +01-555-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END
    AS aug
  FROM documents
),
s AS (
  SELECT doc_id, aug,
    regexp_replace(regexp_replace(aug, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
  FROM aug
)
SELECT doc_id,
  CAST(len(regexp_extract_all(aug, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(aug, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
  CAST(length(scrubbed) AS BIGINT) AS clean_len,
  md5(scrubbed) AS clean_hash
FROM s
"""

# ---------------------------------------------------------------------
# Sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------

_N_PACK_SHARDS = 8
_SEQ_BUDGET = 256  # tokens per training sequence


def pack_sequences(
    spark: SparkSession, sf_dir: str, *, n_shards: int = _N_PACK_SHARDS
) -> DataFrame:
    """Assign every document its training-sequence span under
    concat-and-chunk packing: docs are concatenated in doc_id order
    within their pack shard and cut into ``_SEQ_BUDGET``-token
    sequences; a doc starts in ``seq_id`` at ``seq_offset`` and spans
    ``n_seqs_spanned`` sequences (boundary-crossing docs span > 1 —
    real packers either split them there or pad; the span count is the
    decision input). Window is per-shard, never global.

    ``n_shards`` bounds the cumsum-window partition size — the gate
    default matches the oracle SQL; a real deployment sets it ∝ corpus
    size (tokens per shard ≈ what one task should sort)."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)).cast("long")
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    b = F.lit(float(_SEQ_BUDGET))
    seq_id = F.floor(start.cast("double") / b)
    end_seq = F.when(
        F.col("n_tokens") > 0, F.floor((cum - 1).cast("double") / b)
    ).otherwise(seq_id)
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        cum.alias("cum_tokens"),
        seq_id.alias("seq_id"),
        (start % _SEQ_BUDGET).alias("seq_offset"),
        (end_seq - seq_id + 1).alias("n_seqs_spanned"),
    )


_PACK_SQL = f"""
WITH base AS (
  SELECT doc_id, doc_id % {_N_PACK_SHARDS} AS shard,
    CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT *,
    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM base
),
spans AS (
  SELECT *, cum_tokens - n_tokens AS start_tok,
    CAST(FLOOR(CAST(cum_tokens - n_tokens AS DOUBLE) / {_SEQ_BUDGET}.0) AS BIGINT)
      AS seq_id,
    CASE WHEN n_tokens > 0
         THEN CAST(FLOOR(CAST(cum_tokens - 1 AS DOUBLE) / {_SEQ_BUDGET}.0) AS BIGINT)
         ELSE CAST(FLOOR(CAST(cum_tokens - n_tokens AS DOUBLE) / {_SEQ_BUDGET}.0) AS BIGINT)
    END AS end_seq
  FROM c
)
SELECT doc_id, shard, n_tokens, cum_tokens, seq_id,
  start_tok % {_SEQ_BUDGET} AS seq_offset,
  end_seq - seq_id + 1 AS n_seqs_spanned
FROM spans
"""

# ---------------------------------------------------------------------
# Sliding-window document chunking
# ---------------------------------------------------------------------
#
# The chunking step of retrieval / long-context training preprocessing:
# cut each document into overlapping fixed-size token windows (stride <
# window ⇒ consecutive chunks share window−stride tokens of context).
# Pure explode projection — zero shuffles, scales with scan bandwidth.

_CHUNK_WINDOW = 32  # tokens per chunk
_CHUNK_STRIDE = 24  # tokens between chunk starts (8-token overlap)


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks per document (empty docs emit
    no chunks). chunk_hash identifies the chunk content for downstream
    chunk-level dedup."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
    base = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("n_tok")).where(
        F.col("n_tok") > 0
    )
    starts = F.sequence(F.lit(0), F.col("n_tok") - 1, F.lit(_CHUNK_STRIDE))
    e = base.select("doc_id", "toks", "n_tok", F.explode(starts).alias("start_tok"))
    chunk = F.slice(F.col("toks"), F.col("start_tok") + 1, _CHUNK_WINDOW)
    return e.select(
        "doc_id",
        (F.col("start_tok") / _CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(_CHUNK_WINDOW), F.col("n_tok") - F.col("start_tok"))
        .cast("long")
        .alias("chunk_len"),
        F.md5(F.array_join(chunk, " ").cast("binary")).alias("chunk_hash"),
    )


_CHUNKS_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{_BPE_RE}') AS toks,
         len(regexp_extract_all(text, '{_BPE_RE}')) AS n_tok
  FROM documents
),
e AS (
  SELECT doc_id, toks, n_tok, s.start_tok
  FROM t, UNNEST(generate_series(0, n_tok - 1, {_CHUNK_STRIDE})) AS s(start_tok)
  WHERE n_tok > 0
)
SELECT doc_id,
  CAST(start_tok / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
  CAST(start_tok AS BIGINT) AS start_tok,
  CAST(LEAST({_CHUNK_WINDOW}, n_tok - start_tok) AS BIGINT) AS chunk_len,
  md5(array_to_string(toks[start_tok + 1 : start_tok + {_CHUNK_WINDOW}], ' '))
    AS chunk_hash
FROM e
"""

# ---------------------------------------------------------------------
# Content-defined chunking (LBFS / FastCDC-style rolling-hash cuts)
# ---------------------------------------------------------------------
#
# Fixed-stride chunking (doc_chunks above) breaks under insertion: one
# added token shifts every later boundary, so every downstream chunk
# hash changes and chunk-level dedup misses everything after the edit.
# Content-defined chunking cuts where a rolling hash of the LAST
# _CDC_W tokens hits a divisor condition — boundaries are a function
# of local content only, so an edit perturbs at most the chunks it
# touches and all later chunk hashes are preserved (the LBFS anchoring
# property; FastCDC adds min/max clamps, noted below). This is the
# standard storage-dedup primitive applied at the token grain — the
# right grain for near-duplicate training text where documents share
# long verbatim runs (boilerplate, quotations, syndication).

_CDC_W = 4  # rolling-hash horizon (tokens)
_CDC_D = 8  # divisor: expected chunk length = _CDC_D tokens


def cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunks per document: cut after token ``p`` when
    the hash of tokens ``p-3..p`` ≡ 0 (mod ``_CDC_D``). Output one row
    per (doc_id, chunk): start, length, and the content hash that
    feeds chunk-level dedup.

    Relational shape: posexplode → one per-doc ordered window carries
    the 3 lagged token hashes (rolling hash = pure column math), a
    second bounded-frame window turns cut flags into chunk ids
    (running count of PRIOR cuts), then one groupBy rebuilds chunks —
    two keyed window passes + one partial-aggregatable groupBy, no
    self-join, linear in tokens. Production adds FastCDC min/max
    chunk-size clamps (a second condition on ``p - last_cut``); the
    gate keeps the pure divisor rule so the oracle is windowed SQL.
    """
    from trx_spark.queries.textdata import _tok_hash

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
    t = docs.select("doc_id", F.posexplode(toks).alias("p", "t")).withColumn(
        "th", _tok_hash(F.col("t"))
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    h = (
        F.lag("th", 3).over(w) * (31 ** 3)
        + F.lag("th", 2).over(w) * (31 ** 2)
        + F.lag("th", 1).over(w) * 31
        + F.col("th")
    ) % _P
    flagged = t.withColumn(
        "cut",
        F.when((F.col("p") >= _CDC_W - 1) & (h % _CDC_D == 0), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    prior = Window.partitionBy("doc_id").orderBy("p").rowsBetween(
        Window.unboundedPreceding, -1
    )
    chunked = flagged.withColumn(
        "chunk_idx", F.coalesce(F.sum("cut").over(prior), F.lit(0)).cast("long")
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("p"), F.col("t")))),
        lambda s: s["t"],
    )
    return chunked.groupBy("doc_id", "chunk_idx").agg(
        F.min("p").cast("long").alias("start_tok"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.md5(F.array_join(ordered, " ").cast("binary")).alias("chunk_hash"),
    )


def _cdc_sql() -> str:
    from trx_spark.queries.textdata import _tok_hash_sql

    return f"""
WITH toks AS (
  SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) - 1 AS p
  FROM (SELECT doc_id, regexp_extract_all(text, '{_BPE_RE}') AS l FROM documents) x
),
th AS (SELECT doc_id, p, t, {_tok_hash_sql('t')} AS th FROM toks),
roll AS (
  SELECT doc_id, p, t,
    CASE WHEN p >= {_CDC_W - 1} THEN
      (lag(th, 3) OVER w * {31 ** 3} + lag(th, 2) OVER w * {31 ** 2}
       + lag(th, 1) OVER w * 31 + th) % {_P}
    END AS h
  FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY p)
),
flagged AS (
  SELECT doc_id, p, t,
    CASE WHEN h IS NOT NULL AND h % {_CDC_D} = 0 THEN 1 ELSE 0 END AS cut
  FROM roll
),
chunked AS (
  SELECT doc_id, p, t,
    CAST(COALESCE(SUM(cut) OVER (PARTITION BY doc_id ORDER BY p
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk_idx
  FROM flagged
)
SELECT doc_id, chunk_idx, CAST(MIN(p) AS BIGINT) AS start_tok,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  md5(string_agg(t, ' ' ORDER BY p)) AS chunk_hash
FROM chunked GROUP BY doc_id, chunk_idx
"""


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunk-store ledger CDC exists for: rank every occurrence of
    each chunk content (first by (doc_id, start_tok) is the keeper),
    attribute duplicate occurrences to the source that contributed
    them, and report per source how many tokens chunk-level dedup
    eliminates. ``dup_ratio`` is one IEEE division of two exact
    integer sums (identical expression trees in both engines).

    Scale shape: one window partitioned by chunk_hash (group size =
    occurrences of one content, bounded by duplication not corpus),
    one groupBy source — both shuffles on high-cardinality keys.
    """
    chunks = cdc_chunks(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "start_tok")
    ranked = chunks.join(docs, "doc_id").withColumn("occ", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(F.when(F.col("occ") > 1, 1).otherwise(0)).cast("long").alias("n_dup_chunks"),
        F.sum(F.when(F.col("occ") > 1, F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("tokens_saved"),
        (
            F.sum(F.when(F.col("occ") > 1, F.col("n_tokens")).otherwise(0)).cast("double")
            / F.sum("n_tokens").cast("double")
        ).alias("dup_ratio"),
    )


def _cdc_dedup_sql() -> str:
    return f"""
WITH chunks AS ({_cdc_sql()}),
ranked AS (
  SELECT d.source, c.n_tokens,
    ROW_NUMBER() OVER (PARTITION BY c.chunk_hash
                       ORDER BY c.doc_id, c.start_tok) AS occ
  FROM chunks c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_chunks,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
  CAST(SUM(CASE WHEN occ > 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_saved,
  CAST(SUM(CASE WHEN occ > 1 THEN n_tokens ELSE 0 END) AS DOUBLE)
    / CAST(SUM(n_tokens) AS DOUBLE) AS dup_ratio
FROM ranked GROUP BY source
"""


# ---------------------------------------------------------------------
# Deterministic epoch shuffle
# ---------------------------------------------------------------------

_N_SHUF_SHARDS = 16
_N_EPOCHS = 2
_EPOCH_C = 7919  # epoch stride in the affine hash (prime)


def epoch_shuffle(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_epochs: int = _N_EPOCHS,
    n_shards: int = _N_SHUF_SHARDS,
) -> DataFrame:
    """Per-epoch training order: affine hash of (doc_id, epoch) →
    shard + rank within shard. Different epochs permute differently;
    the same epoch always replays the same order.

    Gate defaults match the oracle SQL; a deployment sets ``n_shards``
    ∝ corpus size (docs per shard ≈ one task's sort budget)."""
    if n_epochs < 1:
        # without the guard Spark's default sequence STEP is -1 when
        # start > stop, so n_epochs=0 would silently emit epochs
        # [0, -1] — double the corpus under a bogus negative epoch
        raise ValueError(f"n_epochs must be >= 1, got {n_epochs}")
    docs = load_table(spark, sf_dir, "documents")
    e = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_epochs - 1), F.lit(1))
        ).alias("epoch"),
    ).withColumn(
        "h",
        (
            F.col("doc_id") % _P * _SAMPLE_A
            + F.col("epoch").cast("long") * _EPOCH_C
            + _SAMPLE_B
        )
        % _P,
    )
    w = Window.partitionBy("epoch", "shard").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        e.withColumn("shard", F.col("h") % n_shards)
        .select(
            F.col("epoch").cast("long").alias("epoch"),
            "shard",
            F.row_number().over(w).alias("pos"),
            "doc_id",
        )
    )


_SHUFFLE_SQL = f"""
WITH e AS (
  SELECT d.doc_id, ep.epoch,
    (d.doc_id % {_P} * {_SAMPLE_A} + ep.epoch * {_EPOCH_C} + {_SAMPLE_B}) % {_P} AS h
  FROM documents d CROSS JOIN (SELECT i AS epoch FROM range(0, {_N_EPOCHS}) t(i)) ep
)
SELECT CAST(epoch AS BIGINT) AS epoch, h % {_N_SHUF_SHARDS} AS shard,
  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, h % {_N_SHUF_SHARDS}
                          ORDER BY h ASC, doc_id ASC) AS INT) AS pos,
  doc_id
FROM e
"""




# ---------------------------------------------------------------------
# Padding-waste audit: length-bucketed vs shuffled batching
# ---------------------------------------------------------------------
#
# For padded (non-packed) training batches, every batch costs
# max_len × batch_size tokens of compute; tokens beyond a sequence's
# length are padding. Length-bucketed batching (sort by length before
# cutting batches — the bucketing every production dataloader does)
# minimizes per-batch length spread; this audit MEASURES the padding
# it saves against hash-shuffled batching on the same corpus, inside
# the engine — the layout_scan_savings pattern applied to the batch
# dimension.

_BATCH_SIZE = 16
_N_BATCH_SHARDS = 8


def padding_waste_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two batching strategies over identical shards (shard = affine
    hash % n_shards, the per-worker batching production uses
    — no global sort anywhere): ``shuffled`` orders docs by the hash,
    ``length_bucketed`` orders by token count; both cut _BATCH_SIZE-doc
    batches in order. Output per strategy: batches, real vs padded
    token totals, and the waste ratio (one IEEE division of two exact
    integer sums).

    Plan shape: one scan computes tokens + shard + both orderings;
    each strategy is a per-shard window (partition = shard, bounded by
    corpus/shards — the pack_sequences decomposition) + one
    per-(shard, batch) groupBy + one global rollup to 1 row — shuffle
    keys all high-cardinality until the final constant-size rollup."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)).cast("long")
    h = (F.col("doc_id") % _P * _SAMPLE_A + _SAMPLE_B) % _P
    base = docs.select(
        "doc_id", n_tok.alias("n_tokens"), h.alias("h"), (h % _N_BATCH_SHARDS).alias("shard")
    )

    def _strategy(order_cols: list, label: str) -> DataFrame:
        w = Window.partitionBy("shard").orderBy(*order_cols)
        batched = base.withColumn(
            "batch", ((F.row_number().over(w) - 1) / _BATCH_SIZE).cast("long")
        )
        per_batch = batched.groupBy("shard", "batch").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("real"),
            (F.max("n_tokens") * F.count(F.lit(1))).alias("padded"),
        )
        return per_batch.agg(
            F.lit(label).alias("strategy"),
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("real").cast("long").alias("real_tokens"),
            F.sum("padded").cast("long").alias("padded_tokens"),
            (
                (F.sum("padded") - F.sum("real")).cast("double")
                / F.sum("padded").cast("double")
            ).alias("waste_ratio"),
        )

    return _strategy([F.col("h").asc(), F.col("doc_id").asc()], "shuffled").unionByName(
        _strategy([F.col("n_tokens").asc(), F.col("doc_id").asc()], "length_bucketed")
    )


_PADDING_SQL = f"""
WITH base AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_tokens,
    (doc_id % {_P} * {_SAMPLE_A} + {_SAMPLE_B}) % {_P} AS h,
    (doc_id % {_P} * {_SAMPLE_A} + {_SAMPLE_B}) % {_P} % {_N_BATCH_SHARDS} AS shard
  FROM documents
),
sb AS (
  SELECT shard,
    CAST((ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1)
         // {_BATCH_SIZE} AS BIGINT) AS batch,
    n_tokens
  FROM base
),
lb AS (
  SELECT shard,
    CAST((ROW_NUMBER() OVER (PARTITION BY shard ORDER BY n_tokens, doc_id) - 1)
         // {_BATCH_SIZE} AS BIGINT) AS batch,
    n_tokens
  FROM base
),
sper AS (
  SELECT shard, batch, SUM(n_tokens) AS real,
         MAX(n_tokens) * COUNT(*) AS padded
  FROM sb GROUP BY shard, batch
),
lper AS (
  SELECT shard, batch, SUM(n_tokens) AS real,
         MAX(n_tokens) * COUNT(*) AS padded
  FROM lb GROUP BY shard, batch
)
SELECT 'shuffled' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_batches,
  CAST(SUM(real) AS BIGINT) AS real_tokens,
  CAST(SUM(padded) AS BIGINT) AS padded_tokens,
  CAST(SUM(padded) - SUM(real) AS DOUBLE) / CAST(SUM(padded) AS DOUBLE)
    AS waste_ratio
FROM sper
UNION ALL
SELECT 'length_bucketed' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_batches,
  CAST(SUM(real) AS BIGINT) AS real_tokens,
  CAST(SUM(padded) AS BIGINT) AS padded_tokens,
  CAST(SUM(padded) - SUM(real) AS DOUBLE) / CAST(SUM(padded) AS DOUBLE)
    AS waste_ratio
FROM lper
"""


# ---------------------------------------------------------------------
# Training-set manifest: the composed last mile
# ---------------------------------------------------------------------


def training_set_manifest(
    spark: SparkSession, sf_dir: str, *, n_shards: int = _N_PACK_SHARDS
) -> DataFrame:
    """The capstone composition: the corpus keep-list verdict
    (exact-keeper ∧ near-dup-canonical ∧ quality) gates the corpus,
    the survivors are assigned to pack shards, and the manifest a
    training job consumes rolls up per shard: document count, token
    count, and the number of _SEQ_BUDGET-token sequences the shard
    packs into.

    Plan: the keep-list rides its memoized component stages
    (LSH pair table, quality signals); the manifest itself is one
    semi-join + one partial-aggregatable groupBy — no window, no
    global sort, nothing driver-side. Output: (shard, n_docs,
    n_tokens, n_seqs)."""
    from trx_spark.queries.corpus import corpus_keep_list

    kept = corpus_keep_list(spark, sf_dir).filter(F.col("keep")).select("doc_id")
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)).cast("long")
    base = docs.join(kept, "doc_id", "left_semi").select(
        (F.col("doc_id") % n_shards).alias("shard"), n_tok.alias("n_tokens")
    )
    b = F.lit(float(_SEQ_BUDGET))
    return base.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.ceil(F.sum("n_tokens").cast("double") / b).alias("n_seqs"),
    )


def _manifest_sql() -> str:
    from trx_spark.queries.corpus import _keep_list_sql

    return f"""
WITH kept AS (
  SELECT doc_id FROM ({_keep_list_sql()}) WHERE keep
),
base AS (
  SELECT CAST(d.doc_id % {_N_PACK_SHARDS} AS BIGINT) AS shard,
         CAST(len(regexp_extract_all(d.text, '{_BPE_RE}')) AS BIGINT) AS n_tokens
  FROM documents d JOIN kept k ON d.doc_id = k.doc_id
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(ceil(CAST(SUM(n_tokens) AS DOUBLE) / {float(_SEQ_BUDGET)}) AS BIGINT) AS n_seqs
FROM base GROUP BY shard
"""



# ---------------------------------------------------------------------
# First-fit-decreasing bin packing (the T5/FlanT5-style "pack examples
# into fixed-length sequences without splitting" step; Johnson 1973
# proves FFD ≤ 11/9·OPT + 1 bins).  pack_sequences above is
# concat-and-chunk (docs may straddle sequence boundaries);
# padding_waste_audit measures 16 % padding waste for length-BUCKETED
# batching.  FFD closes the loop: whole docs, no straddling, measured
# waste below the bucketed baseline (the dominance test in
# tests/test_ffd_pack.py).
#
# Execution shape: the greedy is inherently sequential PER SHARD, so it
# runs as an Arrow-batched applyInPandas over the same doc_id-mod
# shards as pack_sequences — one shuffle on the shard key, then pure
# per-shard Python over (n_tokens, doc_id) pairs only (never the
# text).  A deployment sizes n_shards ∝ corpus so docs-per-shard stays
# one task's working set; packing quality is per-shard by design (the
# same locality every production packer accepts).  The DuckDB oracle
# replays the identical greedy as a recursive CTE carrying each
# shard's bin-load list, so the assignment is hash-checked end-to-end.
# Docs with 0 tokens or > _SEQ_BUDGET tokens are ineligible (empty
# docs pack nothing; oversized docs belong to the chunking path) and
# are ledgered by ffd_pack_stats instead of silently dropped.
# ---------------------------------------------------------------------


def _ffd_eligible(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)).cast("long")
    return docs.select(
        "doc_id",
        (F.col("doc_id") % _N_PACK_SHARDS).alias("shard"),
        n_tok.alias("n_tokens"),
    )


def ffd_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc FFD bin assignment: within each shard, docs sorted by
    (n_tokens DESC, doc_id ASC) go to the lowest-numbered open bin
    with room, else open a new bin. Output: (doc_id, shard, n_tokens,
    bin_id) for every eligible doc (1 ≤ n_tokens ≤ _SEQ_BUDGET)."""
    base = _ffd_eligible(spark, sf_dir).filter(
        (F.col("n_tokens") >= 1) & (F.col("n_tokens") <= _SEQ_BUDGET)
    )
    budget = _SEQ_BUDGET

    def pack(pdf):
        # closure-self-contained (workers may not have the repo cwd)
        import pandas as pd  # noqa: F401 (re-import inside the worker)

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        loads: list[int] = []
        bins: list[int] = []
        for length in pdf["n_tokens"]:
            for i in range(len(loads)):
                if loads[i] + length <= budget:
                    loads[i] += int(length)
                    bins.append(i)
                    break
            else:
                bins.append(len(loads))
                loads.append(int(length))
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "shard", "n_tokens", "bin_id"]]

    return base.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard long, n_tokens long, bin_id long"
    )


def _ffd_sql_core() -> str:
    """Recursive-CTE replay of the identical greedy (rnk-by-rnk per
    shard, bin loads carried as a list)."""
    return f"""base AS (
  SELECT doc_id, CAST(doc_id % {_N_PACK_SHARDS} AS BIGINT) AS shard,
         CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_tokens
  FROM documents
),
elig AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY shard
              ORDER BY n_tokens DESC, doc_id ASC) AS BIGINT) AS rnk
  FROM base WHERE n_tokens >= 1 AND n_tokens <= {_SEQ_BUDGET}
),
packer AS (
  SELECT shard, CAST(0 AS BIGINT) AS rnk, CAST([] AS BIGINT[]) AS loads,
         CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_tokens,
         CAST(NULL AS BIGINT) AS bin_id
  FROM (SELECT DISTINCT shard FROM elig)
  UNION ALL
  SELECT e.shard, e.rnk,
         CASE WHEN fit.idx IS NULL THEN list_append(p.loads, e.n_tokens)
              ELSE list_transform(range(1, len(p.loads) + 1),
                     i -> CASE WHEN i = fit.idx THEN p.loads[i] + e.n_tokens
                               ELSE p.loads[i] END)
         END AS loads,
         e.doc_id, e.n_tokens,
         CASE WHEN fit.idx IS NULL THEN CAST(len(p.loads) AS BIGINT)
              ELSE CAST(fit.idx - 1 AS BIGINT) END AS bin_id
  FROM packer p
  JOIN elig e ON e.shard = p.shard AND e.rnk = p.rnk + 1,
  LATERAL (SELECT list_filter(range(1, len(p.loads) + 1),
                              i -> p.loads[i] + e.n_tokens <= {_SEQ_BUDGET})[1]
           AS idx) fit
)"""


_FFD_ASSIGN_SQL = f"""
WITH RECURSIVE {_ffd_sql_core()}
SELECT doc_id, shard, n_tokens, bin_id FROM packer WHERE doc_id IS NOT NULL
"""


def ffd_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing manifest a training job consumes, per shard: docs
    and bins packed, token fill vs bin capacity, the waste ratio (one
    IEEE division of exact integer sums — the padding_waste_audit
    framing), and the ineligible ledger (empty + oversized docs with
    their token mass)."""
    assigned = ffd_pack_assignments(spark, sf_dir)
    packed = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs_packed"),
        (F.max("bin_id") + 1).alias("n_bins"),
        F.sum("n_tokens").alias("packed_tokens"),
    )
    all_docs = _ffd_eligible(spark, sf_dir)
    ledger = all_docs.groupBy("shard").agg(
        F.sum(F.when(F.col("n_tokens") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_empty"),
        F.sum(F.when(F.col("n_tokens") > _SEQ_BUDGET, 1).otherwise(0))
        .cast("long")
        .alias("n_oversize"),
        F.sum(F.when(F.col("n_tokens") > _SEQ_BUDGET, F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("oversize_tokens"),
    )
    cap = F.col("n_bins") * _SEQ_BUDGET
    return (
        packed.join(ledger, "shard")
        .withColumn("capacity_tokens", cap)
        .withColumn(
            "waste_ratio",
            (cap - F.col("packed_tokens")).cast("double") / cap.cast("double"),
        )
        .select(
            "shard",
            "n_docs_packed",
            "n_bins",
            "packed_tokens",
            "capacity_tokens",
            "waste_ratio",
            "n_empty",
            "n_oversize",
            "oversize_tokens",
        )
    )


_FFD_STATS_SQL = f"""
WITH RECURSIVE {_ffd_sql_core()},
packed AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs_packed,
         CAST(MAX(bin_id) + 1 AS BIGINT) AS n_bins,
         CAST(SUM(n_tokens) AS BIGINT) AS packed_tokens
  FROM packer WHERE doc_id IS NOT NULL GROUP BY shard
),
ledger AS (
  SELECT shard,
    CAST(SUM(CASE WHEN n_tokens = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
    CAST(SUM(CASE WHEN n_tokens > {_SEQ_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
      AS n_oversize,
    CAST(SUM(CASE WHEN n_tokens > {_SEQ_BUDGET} THEN n_tokens ELSE 0 END)
         AS BIGINT) AS oversize_tokens
  FROM base GROUP BY shard
)
SELECT p.shard, p.n_docs_packed, p.n_bins, p.packed_tokens,
  p.n_bins * {_SEQ_BUDGET} AS capacity_tokens,
  CAST(p.n_bins * {_SEQ_BUDGET} - p.packed_tokens AS DOUBLE)
    / CAST(p.n_bins * {_SEQ_BUDGET} AS DOUBLE) AS waste_ratio,
  l.n_empty, l.n_oversize, l.oversize_tokens
FROM packed p JOIN ledger l ON p.shard = l.shard
"""


# ---------------------------------------------------------------------
# Fill-in-the-middle transform audit (Bavarian et al., "Efficient
# Training of Language Models to Fill in the Middle", 2022): the PSM
# split at deterministic token boundaries — prefix = tokens
# [1, n DIV 3], middle = (n DIV 3, 2n DIV 3], suffix = the rest.
# Docs under _FIM_MIN_TOKENS pass through untransformed (no middle to
# infill). Integer DIV on both engines (double-then-cast would round
# in DuckDB but truncate in Spark).
# ---------------------------------------------------------------------

_FIM_MIN_TOKENS = 3


def fim_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source FIM transform ledger: how many docs split, the token
    mass of each PSM segment, the passthrough mass, and the realized
    middle fraction (one IEEE division of exact integer sums) — the
    audit a code-model data pipeline runs before committing an infill
    mix. Map-only scan → one partial-aggregatable groupBy on source."""
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    n = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)).cast(
        "long"
    )
    base = docs.select("source", n.alias("n_tokens")).select(
        "source",
        "n_tokens",
        F.expr("n_tokens DIV 3").alias("p_n"),
        (F.expr("(2 * n_tokens) DIV 3") - F.expr("n_tokens DIV 3")).alias(
            "m_n"
        ),
        (F.col("n_tokens") - F.expr("(2 * n_tokens) DIV 3")).alias("s_n"),
        (F.col("n_tokens") >= _FIM_MIN_TOKENS).alias("fim"),
    )
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("fim"), 1).otherwise(0)).cast("long").alias(
            "n_fim_docs"
        ),
        F.sum(F.when(F.col("fim"), F.col("p_n")).otherwise(0))
        .cast("long")
        .alias("prefix_tokens"),
        F.sum(F.when(F.col("fim"), F.col("m_n")).otherwise(0))
        .cast("long")
        .alias("middle_tokens"),
        F.sum(F.when(F.col("fim"), F.col("s_n")).otherwise(0))
        .cast("long")
        .alias("suffix_tokens"),
        F.sum(F.when(~F.col("fim"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("passthrough_tokens"),
    )
    total = (
        F.col("prefix_tokens") + F.col("middle_tokens") + F.col("suffix_tokens")
    )
    return agg.select(
        "source",
        "n_docs",
        "n_fim_docs",
        "prefix_tokens",
        "middle_tokens",
        "suffix_tokens",
        "passthrough_tokens",
        F.when(
            total > 0,
            F.col("middle_tokens").cast("double") / total.cast("double"),
        )
        .otherwise(F.lit(0.0).cast("double"))
        .alias("middle_frac"),
    )


_FIM_SQL = f"""
WITH base AS (
  SELECT source,
    CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_tokens
  FROM documents
),
seg AS (
  SELECT source, n_tokens,
    n_tokens // 3 AS p_n,
    (2 * n_tokens) // 3 - n_tokens // 3 AS m_n,
    n_tokens - (2 * n_tokens) // 3 AS s_n,
    n_tokens >= {_FIM_MIN_TOKENS} AS fim
  FROM base
),
agg AS (
  SELECT source,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN fim THEN 1 ELSE 0 END) AS BIGINT) AS n_fim_docs,
    CAST(SUM(CASE WHEN fim THEN p_n ELSE 0 END) AS BIGINT) AS prefix_tokens,
    CAST(SUM(CASE WHEN fim THEN m_n ELSE 0 END) AS BIGINT) AS middle_tokens,
    CAST(SUM(CASE WHEN fim THEN s_n ELSE 0 END) AS BIGINT) AS suffix_tokens,
    CAST(SUM(CASE WHEN NOT fim THEN n_tokens ELSE 0 END) AS BIGINT)
      AS passthrough_tokens
  FROM seg GROUP BY source
)
SELECT source, n_docs, n_fim_docs, prefix_tokens, middle_tokens,
  suffix_tokens, passthrough_tokens,
  CASE WHEN prefix_tokens + middle_tokens + suffix_tokens > 0
       THEN CAST(middle_tokens AS DOUBLE)
            / CAST(prefix_tokens + middle_tokens + suffix_tokens AS DOUBLE)
       ELSE CAST(0.0 AS DOUBLE) END AS middle_frac
FROM agg
"""


QUERIES = {
    "pii_scrub": pii_scrub,
    "pack_sequences": pack_sequences,
    "doc_chunks": doc_chunks,
    "cdc_chunks": cdc_chunks,
    "cdc_chunk_dedup": cdc_chunk_dedup,
    "padding_waste_audit": padding_waste_audit,
    "ffd_pack_assignments": ffd_pack_assignments,
    "ffd_pack_stats": ffd_pack_stats,
    "fim_split_stats": fim_split_stats,
    "epoch_shuffle": epoch_shuffle,
    "training_set_manifest": training_set_manifest,
}

ORACLES = {
    "pii_scrub": _PII_SQL,
    "pack_sequences": _PACK_SQL,
    "doc_chunks": _CHUNKS_SQL,
    "cdc_chunks": _cdc_sql(),
    "cdc_chunk_dedup": _cdc_dedup_sql(),
    "padding_waste_audit": _PADDING_SQL,
    "ffd_pack_assignments": _FFD_ASSIGN_SQL,
    "ffd_pack_stats": _FFD_STATS_SQL,
    "fim_split_stats": _FIM_SQL,
    "epoch_shuffle": _SHUFFLE_SQL,
    "training_set_manifest": _manifest_sql(),
}
