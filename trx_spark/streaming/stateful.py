"""Custom stateful streaming operator via ``applyInPandasWithState``
(the brief's "applyInPandasWithState for custom stateful operators").

``running_key_stats`` maintains per-key running (count, sum, min, max)
ACROSS micro-batches — unlike the foreachBatch re-reduction in
:mod:`trx_spark.streaming.incremental` (which recomputes from the
accumulated store), the state here lives in the streaming state store:
O(keys) memory, no re-read of history, exactly the shape of an online
per-scan-point accumulator at 100 TB where the store re-read would be
the bottleneck.

The reference's online loop keeps its running state in in-memory numpy
accumulators re-built per poll (trx/azav.py:300-362); the state-store
version survives restarts via the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def running_key_stats(
    stream: DataFrame,
    *,
    key: str = "k",
    value: str = "v",
) -> DataFrame:
    """Per-key running stats, updated incrementally per micro-batch.

    Output (update mode): one row per key per batch in which the key
    appeared — ``(key, n, total, vmin, vmax, mean)`` reflecting ALL rows
    seen for the key so far. NULL values are excluded from every
    statistic INCLUDING the count (SQL count-non-null / avg semantics —
    counting nulls into n while pandas' skipna sums excluded them
    would skew the mean), and the key column keeps the stream's own
    key dtype (a bigint scan-point id groups as bigint, not a
    stringified copy).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_type = stream.schema[key].dataType.simpleString()
    out_schema = (
        f"{key} {key_type}, n bigint, total double, vmin double, "
        f"vmax double, mean double"
    )
    state_schema = "n bigint, total double, vmin double, vmax double"

    def update(group_key, pdf_iter, state):
        # closure-self-contained: workers unpickle this without needing
        # the trx_spark package importable from their cwd
        import pandas as pd

        if state.exists:
            n, total, vmin, vmax = state.get
        else:
            n, total, vmin, vmax = 0, 0.0, None, None
        for pdf in pdf_iter:
            vals = pdf[value].astype(float).dropna()
            if len(vals) == 0:
                continue
            n += int(len(vals))
            total += float(vals.sum())
            bmin, bmax = float(vals.min()), float(vals.max())
            vmin = bmin if vmin is None else min(vmin, bmin)
            vmax = bmax if vmax is None else max(vmax, bmax)
        state.update((n, total, vmin, vmax))
        yield pd.DataFrame(
            {
                key: [group_key[0]],
                "n": [n],
                "total": [total],
                "vmin": [vmin],
                "vmax": [vmax],
                "mean": [total / n if n else None],
            }
        )

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
