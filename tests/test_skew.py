"""Salted-join equality and distribution tests (operators/skew.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_clickstream_processor_msk_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # hot key: rows 200..1999 all carry k=0 (1820 of 2000 rows); the first
    # 200 rows spread over the 10 dimension keys so every key matches
    fact = spark.createDataFrame(
        [((i % 10) if i < 200 else 0, i) for i in range(2000)],
        "k int, v long",
    )
    dim = spark.createDataFrame(
        [(i, f"name{i}") for i in range(10)], "k int, name string"
    )
    return fact, dim


def test_salted_join_row_identical_to_plain_join(spark):
    fact, dim = _skewed_frames(spark)
    want = sorted(tuple(r) for r in fact.join(dim, on=["k"]).collect())
    got = sorted(tuple(r) for r in salted_join(fact, dim, ["k"], n_salt=8).collect())
    assert got == want
    assert len(got) == 2000  # every fact row matched exactly once


def test_salt_spreads_hot_key_and_replicates_small_side(spark):
    fact, dim = _skewed_frames(spark)
    # the salted small side is exactly n_salt copies per key
    from flink_clickstream_processor_msk_spark.operators.skew import _SALT

    n_salt = 8
    right = dim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    assert right.count() == 10 * n_salt
    # hot-key rows actually land on multiple salt values (the point)
    left = fact.withColumn(_SALT, F.floor(F.rand(42) * n_salt).cast("int"))
    hot_salts = (
        left.filter("k = 0").select(_SALT).distinct().count()
    )
    assert hot_salts > 1


def test_salted_join_rejects_bad_inputs(spark):
    fact, dim = _skewed_frames(spark)
    with pytest.raises(ValueError, match="n_salt"):
        salted_join(fact, dim, ["k"], n_salt=0)
    with pytest.raises(ValueError, match="reserved"):
        salted_join(fact.withColumn("_skew_salt", F.lit(1)), dim, ["k"])
