"""Property check of the skew operators: for ANY salt source and salt
count, the salted join/aggregation must equal the plain formulation —
salting redistributes work, never results (fixed-point sums are
associative; join multiplicity is salt-independent)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trx_spark.exact import SCALE, fint
from trx_spark.operators.skew import salted_agg, salted_join


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_salt=st.integers(min_value=1, max_value=32),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_salted_equals_plain(spark, n_salt, seed):
    rng = np.random.default_rng(seed)
    n = 60
    big = pd.DataFrame(
        {
            "rid": np.arange(n),
            "k": rng.choice(["a", "b", "c"], n),  # 3 hot keys
            "v": np.round(rng.normal(0, 5, n), 3),
        }
    )
    small = pd.DataFrame({"k": ["a", "b", "c"], "w": [1.0, 2.0, 3.0]})
    bdf, sdf = spark.createDataFrame(big), spark.createDataFrame(small)

    j = salted_join(bdf, sdf, on="k", salt_src="rid", n_salt=n_salt)
    got = {
        r["k"]: (r["ws"], r["n"])
        for r in salted_agg(
            j,
            keys=["k"],
            salt_src="rid",
            n_salt=n_salt,
            aggs=[
                F.sum(fint(F.col("v") * F.col("w"))).alias("_p"),
                F.count(F.lit(1)).alias("_c"),
            ],
            finals=[
                (F.sum("_p").cast("double") / F.lit(SCALE)).alias("ws"),
                F.sum("_c").alias("n"),
            ],
        ).collect()
    }

    plain = big.merge(small, on="k")
    plain["term"] = np.floor(plain["v"] * plain["w"] * SCALE)
    expected = {
        k: (float(g["term"].sum() / SCALE), len(g)) for k, g in plain.groupby("k")
    }
    assert got == expected
