#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual SQL_QUERIES
entries with the noop sink, prints per-query seconds and (optionally)
the formatted plan. Does NOT replace bench.py (frozen for measurement);
numbers quoted in OPTIMIZATION_r07.md come from here when a query is
examined in isolation.

Usage:
    python bench_extra.py q1 q2 ...        # time the named queries
    PLANS_DIR=plans/r07 SUFFIX=_before python bench_extra.py --plans q1 ...
    REPEAT=3 python bench_extra.py q1      # best-of-N (default 2)
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from ocr_model_spark.queries import DEMOTED_SQL_QUERIES, SQL_QUERIES
    from ocr_model_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_plans = "--plans" in sys.argv
    plans_dir = os.environ.get("PLANS_DIR", "plans/r07")
    suffix = os.environ.get("SUFFIX", "")
    repeat = int(os.environ.get("REPEAT", "2"))

    registry = dict(SQL_QUERIES)
    registry.update(DEMOTED_SQL_QUERIES)
    names = args or list(registry)

    results: dict[str, float] = {}
    for name in names:
        fn, _sql = registry[name]
        if dump_plans:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as fh:
                fh.write(txt)
        best = None
        for _ in range(repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            consume(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
        print(f"{name:28s} {best:.3f}", flush=True)
    print({"queries": results, "sf_dir": sf_dir})
    spark.stop()


if __name__ == "__main__":
    main()
