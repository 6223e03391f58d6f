"""A8: best-rotation argmax (reference ``worker/model_manager.py:296-325``).

The reference OCRs a scanned page at 0/90/180/270 degrees and keeps the
rotation whose result scores best (confidence-weighted token count). With
OCR engines absent, the operator is the relational half of that loop: given
a CANDIDATE frame — one row per (page key, rotation) with its quality
metrics — pick each page's argmax row in one aggregation.

One ``max_by`` per group: a single map-side-combining shuffle, no window
sort, no self-join. The ordering struct is (score columns…, -rotation) so
ties resolve to the smallest rotation deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def best_rotation(
    candidates: DataFrame,
    keys: list[str],
    rotation_col: str = "rotation",
    score_cols: tuple[str, ...] = ("avg_conf", "n_tokens"),
) -> DataFrame:
    """One row per key group: the argmax rotation and its winning scores."""
    order = F.struct(
        *[F.col(c) for c in score_cols],
        (-F.col(rotation_col)).alias("_tiebreak"),
    )
    aggs = [F.max_by(F.col(rotation_col), order).alias(f"best_{rotation_col}")]
    aggs += [F.max_by(F.col(c), order).alias(f"best_{c}") for c in score_cols]
    return candidates.groupBy(*keys).agg(*aggs)
