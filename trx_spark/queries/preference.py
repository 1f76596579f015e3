"""Bradley–Terry preference-strength fitting (LLM-pipeline extension;
no reference counterpart — model per Bradley & Terry 1952, the MM
fitting algorithm per Hunter, "MM algorithms for generalized
Bradley-Terry models", Annals of Statistics 2004).

Aggregating pairwise preference judgments into per-item strengths is
the reward-modeling / leaderboard data-prep primitive (Chatbot-Arena
-style rankings are Bradley–Terry fits over battle outcomes).  Here the
"battles" are deterministic co-purchase duels: for every part pair
sharing an order basket, the part with the larger basket quantity wins
(ties to the smaller key), giving a reproducible pairwise-outcome table
with the same shape as human preference data.

Exactness design — the registry's iterative-trainer discipline (gate
INTEGER round state, never a float):  strengths are BIGINT fixed point
at scale ``_BT_SCALE``; each MM round is

    denom_i = Σ_j  n_ij · S·P  DIV  max(w_i + w_j, 1)
    raw_i   = wins_i · S·P     DIV  max(denom_i, 1)
    w_i     = min( raw_i · K  DIV  max(Σ raw DIV S, 1),  K·S )

with integer division only, so Spark and the unrolled-CTE DuckDB oracle
agree bit-for-bit.  The K = ``_BT_MAX_ITEMS`` item cap certifies every
intermediate inside int64 (DuckDB multiplies BIGINTs strictly, Spark
wraps — so the bounds are load-bearing): n_ij·S·P ≤ 1e4·1e12,
wins·S·P ≤ 2e16, raw·K ≤ 5e18, Σraw ≤ K·2e16 ≤ 5.2e18 < 2^63.  The
LEAST/GREATEST guards make every division total (a pair of zero-weight
items cannot occur — their mutual duels gave one of them a win — but
the guard keeps the arithmetic defined on any input).

Scale design (the 100 TB story):
- Corpus volume touches exactly the duel-generation stages: one keyed
  (order, part) quantity aggregation, the audited basket-capped pair
  self-join, and one (i, j) pair aggregation — all partial-
  aggregatable shuffles.
- The MM rounds run entirely on BOUNDED frames: the ≤K-row strength
  state broadcast into the ≤K²/2-row observed-pair table.  Round cost
  is independent of corpus size; round count (``_BT_ROUNDS``) is the
  knob.  This is the classifier_gd / kmeans harness shape: data-sized
  work once up front, iteration over a tiny sufficient-statistics
  frame.
- Items are capped to the K most-compared (deterministic
  participation-count top-K) — the leaderboard framing; at 100 TB the
  same cap bounds the state no matter how many raw items exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trx_spark.tables import load_table

_BT_ROUNDS = 4          # fixed MM iteration budget (unrolled oracle)
_BT_SCALE = 10**6       # S: BIGINT fixed-point strength scale
_BT_PREC = 10**6        # P: reciprocal-precision multiplier
_BT_SP = _BT_SCALE * _BT_PREC
_BT_MAX_ITEMS = 256     # K: leaderboard cap → certified int64 bounds
_BT_MAX_BASKET = 64     # quadratic guard, same cap as copurchase_lift
_BT_TOPK = 20


def _duel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per unordered part pair (ia < ib): duel count n_ij and ia's win
    count, restricted to the _BT_MAX_ITEMS most-compared items."""
    qty = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    )
    sized = qty.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("_bs"))
    kept = (
        qty.join(sized.filter(F.col("_bs") <= _BT_MAX_BASKET), "l_orderkey")
        .drop("_bs")
    )
    a, b = kept.alias("a"), kept.alias("b")
    duels = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("ia"),
        F.col("b.l_partkey").alias("ib"),
        # ties go to the smaller key (= ia, since ia < ib)
        F.when(F.col("a.q") >= F.col("b.q"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("a_won"),
    )
    pairstat = duels.groupBy("ia", "ib").agg(
        F.count(F.lit(1)).alias("n_ij"),
        F.sum("a_won").alias("wins_a"),
    )
    part = pairstat.select(
        F.col("ia").alias("item"), F.col("n_ij").alias("n")
    ).unionAll(
        pairstat.select(F.col("ib").alias("item"), F.col("n_ij").alias("n"))
    )
    topk = (
        part.groupBy("item")
        .agg(F.sum("n").alias("nd"))
        .orderBy(F.desc("nd"), F.asc("item"))
        .limit(_BT_MAX_ITEMS)
        .select("item")
    )
    ka = topk.select(F.col("item").alias("ia"))
    kb = topk.select(F.col("item").alias("ib"))
    return pairstat.join(F.broadcast(ka), "ia").join(F.broadcast(kb), "ib")


def bt_fit(pk: DataFrame, rounds: int = _BT_ROUNDS) -> DataFrame:
    """Fixed-point Bradley–Terry MM fit over a (ia, ib, n_ij, wins_a)
    pair-outcome frame; returns (item, n_duels, wins, losses,
    strength_fp) for every item appearing in a pair."""
    sym = pk.select("ia", "ib", "n_ij").unionAll(
        pk.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), "n_ij"
        )
    )
    wins = (
        pk.select(
            F.col("ia").alias("item"),
            F.col("wins_a").alias("w"),
            F.col("n_ij").alias("n"),
        )
        .unionAll(
            pk.select(
                F.col("ib").alias("item"),
                (F.col("n_ij") - F.col("wins_a")).alias("w"),
                F.col("n_ij").alias("n"),
            )
        )
        .groupBy("item")
        .agg(F.sum("w").alias("wins"), F.sum("n").alias("n_duels"))
        .localCheckpoint()
    )
    w = wins.select(
        "item", F.lit(_BT_SCALE).cast("bigint").alias("w")
    )
    for _ in range(rounds):
        wi = w.select(F.col("item").alias("ia"), F.col("w").alias("w_i"))
        wj = w.select(F.col("item").alias("ib"), F.col("w").alias("w_j"))
        denom = (
            sym.join(F.broadcast(wi), "ia")
            .join(F.broadcast(wj), "ib")
            .select(
                F.col("ia").alias("item"),
                F.expr(
                    f"(n_ij * {_BT_SP}) div greatest(w_i + w_j, 1)"
                ).alias("t"),
            )
            .groupBy("item")
            .agg(F.sum("t").alias("denom"))
        )
        raw = denom.join(F.broadcast(wins), "item").select(
            "item",
            F.expr(f"(wins * {_BT_SP}) div greatest(denom, 1)").alias("raw"),
        )
        tot = raw.agg(F.sum("raw").alias("tot"))
        w = (
            raw.crossJoin(F.broadcast(tot))
            .select(
                "item",
                F.expr(
                    f"least((raw * {_BT_MAX_ITEMS}) div "
                    f"greatest(tot div {_BT_SCALE}, 1), "
                    f"{_BT_MAX_ITEMS * _BT_SCALE})"
                ).alias("w"),
            )
            .localCheckpoint()  # bounded ≤K-row state per round
        )
    return w.join(F.broadcast(wins), "item").select(
        "item",
        "n_duels",
        "wins",
        (F.col("n_duels") - F.col("wins")).alias("losses"),
        F.col("w").alias("strength_fp"),
    )


_PK_CACHE: dict = {}


def bradley_terry_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``_BT_TOPK`` items of the fixed-point Bradley–Terry fit over
    co-purchase duels after ``_BT_ROUNDS`` MM rounds.

    Columns: item, n_duels, wins, losses, strength_fp (BIGINT at
    _BT_SCALE, total mass normalized to K·S each round).  The duel
    table (the only data-sized work) is memoized per (session, sf_dir)
    like the other derived structures; the MM rounds re-run."""
    key = (spark, sf_dir)
    if key not in _PK_CACHE:
        _PK_CACHE[key] = _duel_pairs(spark, sf_dir).localCheckpoint()
    return (
        bt_fit(_PK_CACHE[key])
        .orderBy(F.desc("strength_fp"), F.asc("item"))
        .limit(_BT_TOPK)
    )


def _bt_round_ctes(r: int) -> str:
    return f"""
d{r} AS MATERIALIZED (
  SELECT s.ia AS item,
    CAST(SUM((s.n_ij * {_BT_SP}) // GREATEST(wi.w + wj.w, 1)) AS BIGINT)
      AS denom
  FROM sym s
  JOIN w{r - 1} wi ON s.ia = wi.item
  JOIN w{r - 1} wj ON s.ib = wj.item
  GROUP BY s.ia
),
r{r} AS MATERIALIZED (
  SELECT d.item, (n.wins * {_BT_SP}) // GREATEST(d.denom, 1) AS raw
  FROM d{r} d JOIN wins n ON d.item = n.item
),
t{r} AS (SELECT CAST(SUM(raw) AS BIGINT) AS tot FROM r{r}),
w{r} AS MATERIALIZED (
  SELECT item,
    CAST(LEAST((raw * {_BT_MAX_ITEMS}) // GREATEST(tot // {_BT_SCALE}, 1),
               {_BT_MAX_ITEMS * _BT_SCALE}) AS BIGINT) AS w
  FROM r{r} CROSS JOIN t{r}
)"""


_BT_SQL = (
    f"""
WITH qty AS (
  SELECT l_orderkey, l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
),
sized AS (
  SELECT l_orderkey FROM qty GROUP BY 1
  HAVING COUNT(*) <= {_BT_MAX_BASKET}
),
kept AS MATERIALIZED (
  SELECT q.l_orderkey, q.l_partkey, q.q FROM qty q JOIN sized USING (l_orderkey)
),
pairstat0 AS MATERIALIZED (
  SELECT a.l_partkey AS ia, b.l_partkey AS ib,
         CAST(COUNT(*) AS BIGINT) AS n_ij,
         CAST(SUM(CASE WHEN a.q >= b.q THEN 1 ELSE 0 END) AS BIGINT)
           AS wins_a
  FROM kept a JOIN kept b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
topk AS MATERIALIZED (
  SELECT item FROM (
    SELECT item, CAST(SUM(n) AS BIGINT) AS nd FROM (
      SELECT ia AS item, n_ij AS n FROM pairstat0
      UNION ALL SELECT ib, n_ij FROM pairstat0
    ) GROUP BY item
  ) ORDER BY nd DESC, item ASC LIMIT {_BT_MAX_ITEMS}
),
pk AS MATERIALIZED (
  SELECT p.ia, p.ib, p.n_ij, p.wins_a FROM pairstat0 p
  JOIN topk a ON p.ia = a.item JOIN topk b ON p.ib = b.item
),
sym AS MATERIALIZED (
  SELECT ia, ib, n_ij FROM pk
  UNION ALL SELECT ib AS ia, ia AS ib, n_ij FROM pk
),
wins AS MATERIALIZED (
  SELECT item, CAST(SUM(w) AS BIGINT) AS wins,
         CAST(SUM(n) AS BIGINT) AS n_duels
  FROM (
    SELECT ia AS item, wins_a AS w, n_ij AS n FROM pk
    UNION ALL SELECT ib, n_ij - wins_a, n_ij FROM pk
  ) GROUP BY item
),
w0 AS (
  SELECT item, CAST({_BT_SCALE} AS BIGINT) AS w FROM wins
),"""
    + ",".join(_bt_round_ctes(r) for r in range(1, _BT_ROUNDS + 1))
    + f"""
SELECT w.item, n.n_duels, n.wins, n.n_duels - n.wins AS losses,
       w.w AS strength_fp
FROM w{_BT_ROUNDS} w JOIN wins n ON w.item = n.item
ORDER BY strength_fp DESC, w.item ASC
LIMIT {_BT_TOPK}
"""
)


QUERIES = {
    "bradley_terry_strengths": bradley_terry_strengths,
}

ORACLES = {
    "bradley_terry_strengths": _BT_SQL,
}
