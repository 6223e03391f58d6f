"""Skew handling: the Zipf-hot host must spread across partitions under the
deterministic salt, and the layout must be identical across replays."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_model_spark.pipeline import salted_repartition


def test_hot_host_spreads_and_layout_is_deterministic(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    host = F.expr("parse_url(url, 'HOST')")
    hot = (
        pages.groupBy(host.alias("h")).count().orderBy(F.desc("count")).first()
    )
    assert hot["count"] > 20  # Zipf pool: rank-0 host dominates

    rp = salted_repartition(pages, num_partitions=16, salt_buckets=8)
    dist = (
        rp.withColumn("pid", F.spark_partition_id())
        .filter(host == hot["h"])
        .select("pid")
        .distinct()
        .count()
    )
    # without salting every row of the hot host would land in ONE partition
    assert dist > 1, "salting failed to spread the hot host"

    # determinism: identical replay → identical (url → partition) assignment
    a = rp.withColumn("pid", F.spark_partition_id()).select("url", "pid").toPandas()
    b = (
        salted_repartition(spark.read.parquet(pages_path), 16, 8)
        .withColumn("pid", F.spark_partition_id())
        .select("url", "pid")
        .toPandas()
    )
    assert a.sort_values("url").reset_index(drop=True).equals(
        b.sort_values("url").reset_index(drop=True)
    )
