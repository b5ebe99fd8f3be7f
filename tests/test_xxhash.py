"""Parity: the driver-side XXH64 must equal Spark's xxhash64 on longs —
bucket pruning at query time depends on it."""

from pyspark.sql import functions as F

from geocoderpl_spark.functions.xxhash import xxhash64_long


def test_xxhash64_long_matches_spark(spark):
    vals = [0, 1, -1, 42, 2**31, -(2**31), 2**62, -(2**62), 123456789, 999999999999]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert xxhash64_long(v) == got[v], v


def test_bucket_parity(spark):
    from pyspark.sql import functions as F

    n = 64
    df = spark.range(0, 1000).select(
        F.col("id").alias("term_id"),
        F.pmod(F.xxhash64("id"), F.lit(n)).cast("int").alias("bucket"),
    )
    for r in df.collect():
        assert xxhash64_long(r["term_id"]) % n == r["bucket"]
