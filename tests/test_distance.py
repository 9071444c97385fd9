"""Hand-computed distance cases (FIXTURES.md §4, Tests/Distance/*)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from neighborly_spark.functions import distance as D

A = [1.0, 2.0, 3.0]
B = [4.0, 5.0, 6.0]


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0].v


@pytest.mark.parametrize(
    "metric,expected",
    [
        ("euclidean", math.sqrt(27.0)),
        ("manhattan", 9.0),
        ("chebyshev", 3.0),
        ("minkowski", 81.0 ** (1.0 / 3.0)),
        # cosine returns SIMILARITY (parity quirk, CosineSimilarityCalculator.cs:8-22)
        ("cosine", 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))),
    ],
)
def test_metric_hand_computed(spark, metric, expected):
    got = _one(spark, D.metric_expr(metric, F.lit(A).cast("array<float>"), F.lit(B).cast("array<float>")))
    assert got == pytest.approx(expected, abs=1e-9)


def test_cosine_value_matches_reference_doc(spark):
    # FIXTURES.md §4: cosine similarity of ([1,2,3],[4,5,6]) ≈ 0.9746
    got = _one(spark, D.cosine(F.lit(A).cast("array<float>"), F.lit(B).cast("array<float>")))
    assert got == pytest.approx(0.9746318, abs=1e-6)


def test_magnitude_and_vector_ops(spark):
    a = F.lit(A).cast("array<float>")
    b = F.lit(B).cast("array<float>")
    assert _one(spark, D.magnitude(a)) == pytest.approx(math.sqrt(14.0))
    assert _one(spark, D.v_add(a, b)) == [5.0, 7.0, 9.0]
    assert _one(spark, D.v_sub(b, a)) == [3.0, 3.0, 3.0]
    assert _one(spark, D.v_divide(a, 2.0)) == [0.5, 1.0, 1.5]
    assert _one(spark, D.v_element(a, 0)) == 1.0
    assert _one(spark, D.v_element(a, 2)) == 3.0
    assert _one(spark, D.v_equal(a, a))
    assert not _one(spark, D.v_equal(a, b))


def test_hamming_packed(spark):
    a = F.lit([0b1011, 0b1]).cast("array<long>")
    b = F.lit([0b0010, 0b0]).cast("array<long>")
    # xor = 0b1001 (2 bits) + 0b1 (1 bit) = 3
    assert _one(spark, D.hamming_packed(a, b)) == 3


def test_unknown_metric_raises():
    with pytest.raises(ValueError, match="unknown metric"):
        D.metric_expr("nope", F.lit(A), F.lit(B))


def test_v_normalize(spark):
    from neighborly_spark.functions import distance as D

    df = spark.createDataFrame([([3.0, 4.0],), ([0.0, 0.0],)], "a array<float>")
    rows = df.select(D.v_normalize(F.col("a")).alias("n")).collect()
    assert rows[0].n == pytest.approx([0.6, 0.8])
    assert rows[1].n == [0.0, 0.0]  # zero vector stays itself, no NaN
    mag = df.select(D.magnitude(D.v_normalize(F.col("a"))).alias("m")).collect()
    assert mag[0].m == pytest.approx(1.0, abs=1e-6)
