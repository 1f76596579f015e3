"""Property check of corpus._max_run_count: for ANY word array the
sorted-run fold must equal the max element multiplicity (the value the
old O(distinct·len) transform+filter form computed)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trx_spark.queries.corpus import _max_run_count

_WORDS = ["a", "b", "c", "aa", "bb", ""]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    arrays=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    )
)
def test_max_run_equals_max_multiplicity(spark, arrays):
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i int, arr array<string>"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select("i", _max_run_count(F.col("arr")).alias("m")).collect()
    }
    want = {
        i: (max(Counter(a).values()) if a else 0) for i, a in enumerate(arrays)
    }
    assert got == want
