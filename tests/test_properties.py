"""Property-based tests (SURVEY.md §5): the reference's
ZeroDivisionError→0 semantics (pyspark_stats.py:91-94) and the
length-bucket boundaries (pyspark_stats.py:158-167) must hold for
arbitrary inputs, not just the fixture values."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_imgprocessing_spark.functions import length_bucket, zero_guard_div


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


@settings(max_examples=20, deadline=None)
@given(
    num=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    den=st.integers(min_value=0, max_value=1000),
)
def test_zero_guard_div_total(spark_prop, num, den):
    v = _eval(
        spark_prop, zero_guard_div(F.lit(float(num)), F.lit(den), scale=4)
    )
    if den == 0:
        assert v == 0.0  # the reference's except-ZeroDivisionError → 0
    else:
        assert abs(v - round(num / den, 4)) < 1e-9
    assert v is not None  # never null/NaN


@settings(max_examples=20, deadline=None)
@given(s=st.text(alphabet="abcde ", min_size=0, max_size=30))
def test_length_bucket_boundaries(spark_prop, s):
    v = _eval(spark_prop, length_bucket(F.lit(s), 10, 20))
    n = len(s)
    expected = "under_10" if n < 10 else ("between_10_and_20" if n <= 20 else "over_20")
    assert v == expected


# session-scoped fixture alias usable inside @given (function-scoped
# fixtures don't mix with hypothesis)
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_prop(spark):
    return spark


# ---------------------------------------------------------------------------
# as-of join vs a brute-force Python reference, including DUPLICATE right
# timestamps: for every left row the matched payload must be the maximum
# (ts, tie_break) among right rows with ts <= left_ts for the same key.
# ---------------------------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=1, max_size=8
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=0, max_size=12
    ),
)
def test_asof_join_matches_bruteforce(spark_prop, lefts, rights):
    from bigdata_imgprocessing_spark.operators.asof import asof_join

    spark = spark_prop
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], "lid int, k int, ts int"
    )
    right = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(rights)], "rid int, k int, ts int"
    )
    got = {
        r.lid: r.asof_rid
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts", tie_break="rid"
        ).collect()
    }
    for lid, (k, t) in enumerate(lefts):
        cands = [(rt, rid) for rid, (rk, rt) in enumerate(rights) if rk == k and rt <= t]
        expected = max(cands)[1] if cands else None
        assert got[lid] == expected, (lid, k, t, cands)
