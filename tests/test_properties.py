"""Property-based tests (hypothesis) for the custom join operators —
the §5 analog of the reference's randomized ITCase coverage: the
distributed implementation must agree with a brute-force single-process
model on arbitrary small inputs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_spark.operators.joins import asof_join, interval_join

KEYS = ["a", "b", "c"]

left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 20)),
    min_size=1, max_size=12,
)
# unique (key, ts) on the right: the as-of winner among identical
# versions is unspecified (same as FOR SYSTEM_TIME AS OF)
right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 20), st.integers(-5, 5)),
    min_size=1, max_size=12,
    unique_by=lambda r: (r[0], r[1]),
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], "k string, lts long, lid long"
    )
    right = spark.createDataFrame(rrows, "k string, rts long, val long")
    got = {
        (r["lid"]): (r["val"], r["rts"])
        for r in asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts"
        ).collect()
    }
    for i, (k, t) in enumerate(lrows):
        cands = [(rt, v) for (rk, rt, v) in rrows if rk == k and rt <= t]
        expected = max(cands)[::-1] if cands else (None, None)
        assert got[i] == expected, (i, k, t, got[i], expected)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows)
def test_interval_join_matches_bruteforce(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)],
        "k string, lts long, lid long",
    ).selectExpr("k", "timestamp_seconds(lts) AS lts", "lid")
    right = spark.createDataFrame(
        rrows, "k string, rts long, val long"
    ).selectExpr("k", "timestamp_seconds(rts) AS rts", "val")
    got = sorted(
        (r["lid"], r["val"])
        for r in interval_join(
            left, right, keys=[("k", "k")],
            left_ts="lts", right_ts="rts",
            lower="'-3' SECOND", upper="'2' SECOND",
        ).collect()
    )
    expected = sorted(
        (i, v)
        for i, (k, t) in enumerate(lrows)
        for (rk, rt, v) in rrows
        if rk == k and t - 3 <= rt <= t + 2
    )
    assert got == expected
