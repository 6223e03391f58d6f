"""Skew handling: the Zipf-hot host must spread across partitions under the
deterministic salt, and the layout must be identical across replays."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_model_spark.operators.urls import url_host
from ocr_model_spark.pipeline import salted_repartition


def test_hot_host_spreads_and_layout_is_deterministic(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    host = url_host("url")
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


def test_salted_aggregate_balances_hot_host(spark):
    """Synthetic 50%-hot-host distribution: after the stage-1 (key, salt)
    shuffle the max partition row count stays within 2.5x the mean — an
    unsalted groupBy would put all hot-host rows in ONE partition (16x)."""
    import pandas as pd

    n = 8000
    rows = [
        {
            "url": (
                f"https://hot.example.com/p/{i}"
                if i % 2 == 0
                else f"https://site{i % 40:03d}.example.com/p/{i}"
            ),
            "html": b"<p>x</p>",
        }
        for i in range(n)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    host = url_host("url")
    salt = F.pmod(F.xxhash64("url"), F.lit(32))
    n_part = 16
    dist = (
        df.repartition(n_part, host, salt)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .toPandas()
    )
    mean = n / n_part
    assert dist["count"].max() <= 2.5 * mean, dist.sort_values("count")
    # unsalted baseline really is pathological: hot host -> one partition
    base = (
        df.repartition(n_part, host)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .toPandas()
    )
    assert base["count"].max() >= 0.5 * n


def test_salted_aggregate_two_stage_plan_and_values(spark, pages_path):
    """salted_aggregate: plan shows BOTH exchanges (keys+salt partial,
    keys final) and values equal the plain single-stage groupBy."""
    from ocr_model_spark.operators.skew import host_ingest_counters_batch

    pages = spark.read.parquet(pages_path)
    salted = host_ingest_counters_batch(pages, buckets=8)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "_salt" in plan

    from ocr_model_spark.operators.dispatch import doc_type_col

    plain = (
        pages.groupBy(url_host("url").alias("url_host"))
        .agg(
            F.count("*").alias("total_docs"),
            F.sum(
                (
                    ~doc_type_col(F.col("html")).isin(
                        "pdf", "html", "text", "docx", "doc", "xls", "ppt"
                    )
                ).cast(
                    "long"
                )
            ).alias("total_failed"),
            F.sum(F.coalesce(F.length("html"), F.lit(0)).cast("long")).alias(
                "total_bytes"
            ),
        )
    )
    a = salted.orderBy("url_host").toPandas()
    b = plain.orderBy("url_host").toPandas()
    assert a.equals(b)


def test_salted_aggregate_rejects_unsupported_ops(spark):
    import pytest as _pytest

    from ocr_model_spark.operators.skew import salted_aggregate

    df = spark.range(4).withColumnRenamed("id", "url")
    with _pytest.raises(ValueError, match="unsupported"):
        salted_aggregate(df, ["url"], [("avg", "url", "x")])


def test_cap_per_host_salted_keepset_and_balance(spark):
    """cap_per_host (salted two-stage top-k): (a) the keep-set is byte-
    identical to the naive single-window form, (b) under a 50%-hot-host
    distribution the stage-1 (host, salt) shuffle keeps the max partition
    bounded near the mean — the naive window would sort the whole hot host
    in ONE task."""
    import pandas as pd

    from ocr_model_spark.operators.dedup import stable_hash
    from ocr_model_spark.operators.urls import cap_per_host

    n = 8000
    rows = [
        {
            "url": (
                f"https://hot.example.com/p/{i}"
                if i % 2 == 0
                else f"https://site{i % 40:03d}.example.com/p/{i}"
            ),
        }
        for i in range(n)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    k = 5
    got = sorted(r["url"] for r in cap_per_host(df, k=k).collect())

    from pyspark.sql import Window

    host = url_host("url")
    w = Window.partitionBy(host).orderBy(stable_hash(F.col("url")), F.col("url"))
    naive = (
        df.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")
    )
    want = sorted(r["url"] for r in naive.collect())
    assert got == want

    # stage-1 balance: the (host, salt) shuffle spreads the hot host
    buckets = 32
    salt = F.pmod(F.xxhash64("url"), F.lit(buckets))
    n_part = 16
    dist = (
        df.repartition(n_part, host, salt)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .toPandas()
    )
    assert dist["count"].max() <= 2.5 * (n / n_part), dist.sort_values("count")
