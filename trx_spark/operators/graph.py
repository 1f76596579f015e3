"""Distributed graph primitives. Connected components is the piece a
dedup pipeline needs between "candidate pairs" and "keep one doc per
duplicate group".

Min-label propagation + pointer jumping (the MapReduce CC scheme of
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14): every step is an equi-join/groupBy keyed on vertex id — no
global structure, no single-partition stage. The driver loop moves only
a 0/1 convergence scalar per round (same contract as the U5 iterative
center search, SURVEY §2). Pointer jumping halves the remaining
diameter each round, so rounds are O(log diameter); LSH near-dup
components are near-cliques and converge in 2-4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_ROUNDS = 20


def connected_components(
    pairs: DataFrame, src: str = "src", dst: str = "dst", max_rounds: int = _MAX_ROUNDS
) -> DataFrame:
    """Label every vertex of the undirected pair graph with the minimum
    vertex id reachable from it. Returns ``(id, lbl)`` — one row per
    vertex that appears in ``pairs``; isolated vertices are the
    caller's left-join concern.

    Each round:
      1. lbl(v) <- min(lbl(v), min over neighbors' lbl)  [join + groupBy]
      2. lbl(v) <- lbl(lbl(v))                           [pointer jump]
    Convergence: no label changed (monotone decreasing, bounded below,
    and a fixpoint of step 1 is constant on every edge => per-component
    constant = component min).
    """
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .union(pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("lbl", F.col("id"))
    ).localCheckpoint()
    for _ in range(max_rounds):
        nbr = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        new = labels.join(nbr, "id", "left").select(
            "id", F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl")
        )
        # pointer jump: every label IS a vertex id, so follow it once
        jump = new.select(F.col("id").alias("jid"), F.col("lbl").alias("jlbl"))
        new = (
            new.join(jump, new.lbl == jump.jid, "left")
            .select("id", F.coalesce("jlbl", "lbl").alias("lbl"))
            .localCheckpoint()  # truncate lineage per round
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected components did not converge in {max_rounds} rounds"
    )
