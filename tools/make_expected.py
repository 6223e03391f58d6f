"""Regenerate the committed snapshot-oracle parquet pins (run after an
INTENTIONAL kernel-output change, then commit expected/):

    python -m tools.make_expected [sf_dir ...]

Defaults to sf0.001 (pytest parity) and sf0.01 (driver correctness sf).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_model_spark.entry import SNAPSHOT_QUERIES
from ocr_model_spark.expected import write_pin_manifest, write_snapshot
from ocr_model_spark.session import get_spark


def main(sf_dirs: list[str]) -> None:
    spark = get_spark(app_name="make_expected", master="local[16]", shuffle_partitions=16)
    try:
        for sf_dir in sf_dirs:
            for name, (fn, _order) in SNAPSHOT_QUERIES.items():
                path = write_snapshot(fn(spark, sf_dir), sf_dir, name)
                import pandas as pd

                n = len(pd.read_parquet(path))
                print(f"{os.path.basename(sf_dir)}/{name}: {n} rows -> {path}")
        print("manifest ->", write_pin_manifest())
    finally:
        spark.stop()


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    main(dirs)
