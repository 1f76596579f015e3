"""Property-based check of interp_references against the numpy
behavioral oracle: ANY reference pattern over a short scan must match
(hypothesis drives the pattern space — edge clamps, clusters, single
ref, all-ref, quirky second-to-last cases all emerge)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_reduction_golden import interp_refs_numpy
from trx_spark.operators.reduction import interp_references


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=2, max_value=16),
    data=st.data(),
)
def test_interp_matches_numpy_any_pattern(spark, n, data):
    ref_mask = data.draw(
        st.lists(st.booleans(), min_size=n, max_size=n).filter(lambda m: any(m))
    )
    vals = np.round(
        np.array(data.draw(
            st.lists(
                st.floats(min_value=-100, max_value=100, allow_nan=False),
                min_size=n,
                max_size=n,
            )
        )),
        4,
    )
    pdf = pd.DataFrame(
        {"idx": np.arange(n), "i": vals, "is_ref": ref_mask, "run": "r"}
    )
    out = (
        interp_references(
            spark.createDataFrame(pdf), group=["run"], idx="idx", is_ref="is_ref", value="i"
        )
        .orderBy("idx")
        .toPandas()
    )
    expected = interp_refs_numpy(vals.astype(float), np.flatnonzero(ref_mask))
    np.testing.assert_allclose(
        out["iref"].to_numpy(), expected, rtol=1e-9, atol=1e-12,
        err_msg=f"pattern={ref_mask}",
    )
