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
- The MM rounds run entirely on BOUNDED state: the ≤K²/2-row observed-
  pair table is collected once and folded in driver integers (the
  pca_leading_component discipline — a bounded sufficient-statistics
  block, never data-proportional).  Round cost is independent of
  corpus size; round count (``_BT_ROUNDS``) is the knob.  Data-sized
  work happens once up front in the duel-generation stages.
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
    # checkpoint the pair table BEFORE deriving the top-K filter: the
    # former two-broadcast-join shape executed the whole duel chain
    # three times (once per broadcast build subtree + once for the
    # probe side).  The top-K item list is bounded (≤ _BT_MAX_ITEMS)
    # by construction, so it collects to a literal IN-list instead of
    # two broadcast joins.
    ps = pairstat.localCheckpoint()
    part = ps.select(
        F.col("ia").alias("item"), F.col("n_ij").alias("n")
    ).unionAll(
        ps.select(F.col("ib").alias("item"), F.col("n_ij").alias("n"))
    )
    keep = [
        r.item
        for r in part.groupBy("item")
        .agg(F.sum("n").alias("nd"))
        .orderBy(F.desc("nd"), F.asc("item"))
        .limit(_BT_MAX_ITEMS)
        .collect()
    ]
    return ps.filter(F.col("ia").isin(keep) & F.col("ib").isin(keep))


def bt_fit(pk: DataFrame, rounds: int = _BT_ROUNDS) -> DataFrame:
    """Fixed-point Bradley–Terry MM fit over a (ia, ib, n_ij, wins_a)
    pair-outcome frame; returns (item, n_duels, wins, losses,
    strength_fp) for every item appearing in a pair.

    ``pk`` is BOUNDED by contract (≤ K²/2 rows for K = _BT_MAX_ITEMS —
    the top-K item cap in :func:`_duel_pairs` certifies it at any
    corpus size), so the MM rounds run as a driver-side integer fold
    on the collected pair table: the same arithmetic the distributed
    version ran, minus ~7 Spark jobs per round (broadcast builds,
    per-round localCheckpoints, tiny shuffles) whose scheduling cost
    dominated wall time at every data size.  `//` on the non-negative
    BIGINTs here is exactly Spark's `div` and DuckDB's `//`, and
    Python's unbounded ints agree with both because the K cap
    certifies every intermediate inside int64 (module docstring)."""
    pairs = [
        (r[0], r[1], r[2], r[3])
        for r in pk.select("ia", "ib", "n_ij", "wins_a").collect()
    ]
    wins: dict = {}
    duels: dict = {}
    for ia, ib, n, wa in pairs:
        wins[ia] = wins.get(ia, 0) + wa
        wins[ib] = wins.get(ib, 0) + (n - wa)
        duels[ia] = duels.get(ia, 0) + n
        duels[ib] = duels.get(ib, 0) + n
    sym = [(ia, ib, n) for ia, ib, n, _ in pairs] + [
        (ib, ia, n) for ia, ib, n, _ in pairs
    ]
    w = {i: _BT_SCALE for i in wins}
    cap = _BT_MAX_ITEMS * _BT_SCALE
    for _ in range(rounds):
        denom: dict = {}
        for i, j, n in sym:
            denom[i] = denom.get(i, 0) + (n * _BT_SP) // max(w[i] + w[j], 1)
        raw = {i: (wins[i] * _BT_SP) // max(denom[i], 1) for i in denom}
        tot = sum(raw.values())
        w = {
            i: min((r * _BT_MAX_ITEMS) // max(tot // _BT_SCALE, 1), cap)
            for i, r in raw.items()
        }
    out = [
        (int(i), int(duels[i]), int(wins[i]), int(duels[i] - wins[i]), int(w[i]))
        for i in sorted(wins)
    ]
    return pk.sparkSession.createDataFrame(
        out, "item long, n_duels long, wins long, losses long, strength_fp long"
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
        from trx_spark.cache import build_done, build_start

        _t0 = build_start()
        _PK_CACHE[key] = _duel_pairs(spark, sf_dir).localCheckpoint()
        build_done("bt_duel_pairs", _t0)
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
