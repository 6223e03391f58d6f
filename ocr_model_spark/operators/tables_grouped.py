"""Grouped-map table reconstruction (``applyInPandas``) — the one layout
piece whose reference semantics aren't window-SQL-expressible.

Reference: ``worker/pipeline/tables.py:13-160`` — per table region:
  1. adaptive row threshold ``max(8, 0.6 * median(token heights))``
     (tables.py:62-65, A7);
  2. row grouping by center-y gaps over that threshold (tables.py:67-87, W1);
  3. column centers via hierarchical (Ward) clustering of token center-x
     with distance cutoff 20, falling back to 1-D gap clustering
     (tables.py:108-140, A11/A12 — scipy absent here, so Ward is implemented
     directly in numpy: greedy agglomerative merge by Ward criterion);
  4. token→cell assignment by bucketing center-x into midpoints between
     column centers (tables.py:268-296, J3);
  5. cell text = x-sorted join; confidence = min over tokens; needs_review
     if any token < 0.7 (tables.py:149-158).

Runs per (url, page_num, region_id) group — per-document cardinality is tiny
(tens~hundreds of tokens), so the Python cost is bounded and the shuffle key
matches the natural partitioning of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CELL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("page_num", T.IntegerType()),
        T.StructField("region_id", T.StringType()),
        T.StructField("row_idx", T.IntegerType()),
        T.StructField("col_idx", T.IntegerType()),
        T.StructField("cell_text", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("needs_review", T.BooleanType()),
    ]
)


def ward_cluster_1d(xs: np.ndarray, cutoff: float = 20.0) -> np.ndarray:
    """Greedy agglomerative Ward clustering of 1-D points.

    Deterministic: at each step merge the pair of adjacent clusters (1-D ⇒
    optimal merges are adjacent after sorting) with minimal Ward cost; stop
    when the minimal cost exceeds ``cutoff``². Returns a cluster id per input
    point (ids ordered by cluster center)."""
    order = np.argsort(xs, kind="stable")
    sorted_xs = xs[order]
    # clusters as (count, sum) over contiguous runs
    counts = [1] * len(sorted_xs)
    sums = list(sorted_xs)
    bounds = list(range(len(sorted_xs)))  # start index of each cluster
    while len(counts) > 1:
        best, best_cost = -1, None
        for i in range(len(counts) - 1):
            n1, n2 = counts[i], counts[i + 1]
            m1, m2 = sums[i] / n1, sums[i + 1] / n2
            cost = (n1 * n2) / (n1 + n2) * (m1 - m2) ** 2
            if best_cost is None or cost < best_cost:
                best, best_cost = i, cost
        if best_cost > cutoff**2:
            break
        counts[best] += counts.pop(best + 1)
        sums[best] += sums.pop(best + 1)
        bounds.pop(best + 1)
    labels_sorted = np.zeros(len(sorted_xs), dtype=np.int64)
    for ci, start in enumerate(bounds):
        end = bounds[ci + 1] if ci + 1 < len(bounds) else len(sorted_xs)
        labels_sorted[start:end] = ci
    labels = np.zeros(len(xs), dtype=np.int64)
    labels[order] = labels_sorted
    return labels


def _reconstruct_one(pdf: pd.DataFrame) -> pd.DataFrame:
    url = pdf["url"].iloc[0]
    page = int(pdf["page_num"].iloc[0])
    region = pdf["region_id"].iloc[0]
    cy = ((pdf["y1"] + pdf["y2"]) / 2).to_numpy()
    cx = ((pdf["x1"] + pdf["x2"]) / 2).to_numpy()
    heights = (pdf["y2"] - pdf["y1"]).to_numpy()
    # A7 adaptive threshold
    thr = max(8.0, 0.6 * float(np.median(heights)))
    # W1 row grouping over sorted cy
    order = np.argsort(cy, kind="stable")
    row_ids = np.zeros(len(pdf), dtype=np.int64)
    rid = 0
    prev = None
    for idx in order:
        if prev is not None and cy[idx] - prev > thr:
            rid += 1
        row_ids[idx] = rid
        prev = cy[idx]
    # A12 ward column clustering (cutoff 20, tables.py:113)
    col_ids = ward_cluster_1d(cx, cutoff=20.0)
    out = pdf.assign(_row=row_ids, _col=col_ids)
    rows = []
    for (r, c), g in out.groupby(["_row", "_col"], sort=True):
        g = g.sort_values(["x1", "token_idx"], kind="stable")
        conf = float(g["confidence"].min())
        rows.append(
            {
                "url": url,
                "page_num": page,
                "region_id": region,
                "row_idx": int(r),
                "col_idx": int(c),
                "cell_text": " ".join(g["text"]),
                "confidence": round(conf, 6),
                "n_tokens": int(len(g)),
                "needs_review": bool((g["confidence"] < 0.7).any()),
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in CELL_SCHEMA.fields])


def reconstruct_tables(tokens: DataFrame) -> DataFrame:
    """tokens(url, page_num, region_id, token_idx, text, x1..y2, confidence)
    → one row per reconstructed cell. Grouped-map pandas UDF keyed on the
    table region."""
    return tokens.groupBy("url", "page_num", "region_id").applyInPandas(
        lambda pdf: _reconstruct_one(pdf), CELL_SCHEMA
    )
