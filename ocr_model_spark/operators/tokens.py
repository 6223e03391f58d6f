"""Token/layout layer: the reference's geometry algorithms as window SQL.

Covers (SURVEY.md §2): W1 row grouping (``tables.py:67-87``,
``text_regions.py:9-28``), W2/A11 column clustering (``tables.py:117-140``),
W3 reading order, A7 adaptive median threshold (``tables.py:62-65``),
P4 bbox containment/IoU (``tables.py:299-334``), P5 needs_review
(``tables.py:157``), J3 token→cell assembly (``tables.py:268-296``),
J4/U2 OCR-ensemble merge-dedup (``models/ocr_models.py:155-183``).

Everything here is pure column/window expression code over long-format token
frames ``(url, page_num, token_idx, text, x1, y1, x2, y2, confidence)`` —
no Python in the hot path; the per-group pandas variant for the one
non-SQL-expressible piece (hierarchical clustering) lives in
``operators/tables_grouped.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ocr_model_spark.operators.windows import sessionize

# ------------------------------------------------------------ P4: geometry


def bbox_intersection_area(a_prefix: str, b_prefix: str) -> Column:
    """Intersection area of two bboxes given column prefixes (pure algebra)."""
    ix = F.greatest(F.lit(0.0), F.least(F.col(f"{a_prefix}x2"), F.col(f"{b_prefix}x2"))
                    - F.greatest(F.col(f"{a_prefix}x1"), F.col(f"{b_prefix}x1")))
    iy = F.greatest(F.lit(0.0), F.least(F.col(f"{a_prefix}y2"), F.col(f"{b_prefix}y2"))
                    - F.greatest(F.col(f"{a_prefix}y1"), F.col(f"{b_prefix}y1")))
    return ix * iy


def bbox_iou(a_prefix: str, b_prefix: str) -> Column:
    """IoU of two bboxes (tables.py:316-334)."""
    inter = bbox_intersection_area(a_prefix, b_prefix)
    area = lambda p: (F.col(f"{p}x2") - F.col(f"{p}x1")) * (F.col(f"{p}y2") - F.col(f"{p}y1"))
    union = area(a_prefix) + area(b_prefix) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def token_in_region(token_prefix: str = "", region_prefix: str = "r_") -> Column:
    """J2 join predicate: token center inside region bbox (containment fast
    path of tables.py:299-314)."""
    cx = (F.col(f"{token_prefix}x1") + F.col(f"{token_prefix}x2")) / 2
    cy = (F.col(f"{token_prefix}y1") + F.col(f"{token_prefix}y2")) / 2
    return (
        (cx >= F.col(f"{region_prefix}x1"))
        & (cx < F.col(f"{region_prefix}x2"))
        & (cy >= F.col(f"{region_prefix}y1"))
        & (cy < F.col(f"{region_prefix}y2"))
    )


# --------------------------------------------------- W1/W2: layout grouping


def group_rows(
    tokens: DataFrame,
    by: list[str] = ("url", "page_num"),
    threshold: Column | float = 12.0,
    row_col: str = "row_id",
) -> DataFrame:
    """W1: group tokens into visual rows — sort by center-y, new row when the
    y jump exceeds ``threshold`` (fixed 12px variant of text_regions.py:9-28;
    pass :func:`adaptive_row_threshold`'s column for the tables.py variant)."""
    t = tokens.withColumn("_cy", (F.col("y1") + F.col("y2")) / 2)
    return sessionize(t, list(by), "_cy", threshold, row_col).drop("_cy")


def adaptive_row_threshold(by: list[str] = ("url", "page_num")) -> Column:
    """A7: ``max(8, 0.6 * median(token heights))`` per group (tables.py:62-65).
    Uses percentile_approx — exact enough at per-page cardinality and cheap at
    scale; attach with ``F.max(...).over(Window.partitionBy(*by))``."""
    w = Window.partitionBy(*by)
    med_h = F.expr("percentile_approx(y2 - y1, 0.5)").over(w)
    return F.greatest(F.lit(8.0), 0.6 * med_h)


def cluster_columns(
    tokens: DataFrame,
    by: list[str] = ("url", "page_num"),
    col_col: str = "col_id",
) -> DataFrame:
    """W2/A11: 1-D x-gap clustering — new column when the gap between
    consecutive x-centers exceeds ``max(20, 0.04 * x-span)``
    (tables.py:117-140), as a window sessionization."""
    t = tokens.withColumn("_cx", (F.col("x1") + F.col("x2")) / 2)
    w = Window.partitionBy(*by)
    span = F.max("_cx").over(w) - F.min("_cx").over(w)
    gap = F.greatest(F.lit(20.0), 0.04 * span)
    t = t.withColumn("_gap", gap)
    return sessionize(t, list(by), "_cx", F.col("_gap"), col_col).drop("_cx", "_gap")


def assemble_cells(
    tokens_with_grid: DataFrame,
    by: list[str] = ("url", "page_num"),
    row_col: str = "row_id",
    col_col: str = "col_id",
) -> DataFrame:
    """J3: one output row per grid cell — text is the x-sorted, space-joined
    token text (tables.py:268-296 cell assembly); cell confidence is the min
    of member-token confidences (postprocess.py:23); needs_review if any
    token dips below 0.7 (tables.py:157)."""
    return (
        tokens_with_grid.groupBy(*by, row_col, col_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("x1", "token_idx", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("cell_text"),
            F.min("confidence").alias("confidence"),
            F.min("x1").alias("x1"),
            F.min("y1").alias("y1"),
            F.max("x2").alias("x2"),
            F.max("y2").alias("y2"),
            F.count("*").alias("n_tokens"),
            F.max(F.when(F.col("confidence") < 0.7, True).otherwise(False)).alias(
                "needs_review"
            ),
        )
    )


# ------------------------------------------------------- J4/U2: ensemble


def ensemble_merge(engine_outputs: list[DataFrame]) -> DataFrame:
    """J4/U2: union token sets from N OCR engines, keep the max-confidence
    token per (text, bbox) — ``models/ocr_models.py:155-183`` re-expressed as
    unionByName + max_by."""
    assert engine_outputs
    unioned = engine_outputs[0]
    for other in engine_outputs[1:]:
        unioned = unioned.unionByName(other)
    keys = ["url", "page_num", "text", "x1", "y1", "x2", "y2"]
    return unioned.groupBy(*keys).agg(
        F.max("confidence").alias("confidence"),
        F.expr("max_by(engine, confidence)").alias("engine"),
    )
