"""Generic window-pattern operators (SURVEY.md §2.5).

The reference's layout algorithms are classic Spark window patterns:

  * W1/W2 — gaps-and-islands sessionization (row grouping by y-proximity,
    ``worker/pipeline/tables.py:67-87`` / ``text_regions.py:9-28``; column
    clustering by x-gap, ``tables.py:117-140``);
  * W3 — reading-order ranking (``models/ocr_models.py:181-182``);
  * W4 — running corpus totals (``advanced_ocr_app.py:548-560``);
  * W5 — span offsets (cumulative lengths, north-rule span contract).

All pure expression/window code — whole-stage codegen applies, the only
shuffle is the window partitioning itself, and the same partitioning is
reusable across chained windows (Catalyst collapses adjacent windows with
identical specs into one exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    partition_cols: list[str],
    order_col: str,
    gap: Column | float,
    session_col: str = "session_id",
) -> DataFrame:
    """Gaps-and-islands: a new session starts when ``order_col`` jumps more
    than ``gap`` past the previous row. ``gap`` may be a literal or any
    column expression (e.g. the adaptive ``max(8, 0.6*median(height))``
    threshold of tables.py:62-65 computed beforehand)."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    gap_col = gap if isinstance(gap, Column) else F.lit(float(gap))
    prev = F.lag(order_col).over(w)
    is_new = F.when(prev.isNull() | ((F.col(order_col) - prev) > gap_col), 1).otherwise(0)
    return df.withColumn(session_col, F.sum(is_new).over(w))


def reading_order(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    rank_col: str = "reading_order",
) -> DataFrame:
    """W3: row_number over (y1, x1)-style ordering within a page/document."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w))


def running_total(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    partition_cols: list[str] | None = None,
    out_col: str = "running_total",
) -> DataFrame:
    """W4: cumulative sum in event order (unbounded-preceding → current)."""
    w = Window.partitionBy(*(partition_cols or [])).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def span_offsets(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    length_col: str,
    sep_len: int = 2,
    start_col: str = "span_start",
    end_col: str = "span_end",
) -> DataFrame:
    """W5: char-offset spans for ordered fragments joined with a separator of
    ``sep_len`` chars — ``span_start = Σ(prev lengths + sep)``."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(F.col(length_col) + sep_len).over(w), F.lit(0))
    return df.withColumn(start_col, start.cast("long")).withColumn(
        end_col, (start + F.col(length_col)).cast("long")
    )


def top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """O-family: rank within group and keep the first k."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join (the operator Spark lacks natively): each left
    row gets the latest right values with ``right.time <= left.time`` per
    ``by`` key — LEFT semantics (no match → nulls).

    NOT a join at all: tag both sides, UNION, and carry the right values
    forward with one ``last(..., ignorenulls)`` window — a single shuffle
    on the by-key, no range-explode, no per-row Python. This is the plan
    that survives 10^12 rows; a SortMergeJoin on an inequality can't.

    Equal timestamps: the right row sorts BEFORE the left row (>= / ASOF
    semantics — matches DuckDB's ``ASOF LEFT JOIN``). ``right`` must be
    unique per (by, time) — pre-aggregate duplicates first, or the carried
    value is ambiguous.
    """
    r = right.select(
        *by_cols, time_col, *value_cols, F.lit(0).alias("_is_left")
    )
    l = left.withColumn("_is_left", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(time_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in value_cols:
        u = u.withColumn(
            v,
            F.last(F.when(F.col("_is_left") == 0, F.col(v)), ignorenulls=True).over(w),
        )
    return u.filter(F.col("_is_left") == 1).drop("_is_left")
