"""Adaptive input spread (r06): narrow scans fan out, wide inputs pass
through untouched, and spreading never changes query results."""

from pyspark.sql import functions as F

from deduplication_challenge_spark.sources.pages import spread_input


class TestSpreadInput:
    def test_narrow_input_spreads_to_parallelism(self, spark):
        df = spark.range(0, 1000, 1, 2)  # 2 partitions < defaultParallelism
        out = spread_input(df)
        assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
        assert out.count() == 1000

    def test_wide_input_passes_through(self, spark):
        target = spark.sparkContext.defaultParallelism
        df = spark.range(0, 1000, 1, target + 3)
        out = spread_input(df)
        # unchanged: no repartition exchange added for already-wide scans
        assert out is df

    def test_explicit_floor_respected(self, spark):
        df = spark.range(0, 100, 1, 1)
        assert spread_input(df, min_partitions=7).rdd.getNumPartitions() == 7

    def test_results_identical(self, spark):
        df = spark.range(0, 500, 1, 1).withColumn("v", F.col("id") % 13)
        a = sorted(r["s"] for r in df.groupBy("v").agg(F.sum("id").alias("s")).collect())
        b = sorted(
            r["s"]
            for r in spread_input(df).groupBy("v").agg(F.sum("id").alias("s")).collect()
        )
        assert a == b
