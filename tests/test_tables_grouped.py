"""Table reconstruction (applyInPandas): known grid in, known cells out."""

from __future__ import annotations

import numpy as np

from ocr_model_spark.operators.tables_grouped import reconstruct_tables, ward_cluster_1d


def test_ward_cluster_1d_separates_far_groups():
    xs = np.array([10.0, 12.0, 11.0, 100.0, 103.0, 205.0])
    labels = ward_cluster_1d(xs, cutoff=20.0)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] != labels[0]
    assert labels[5] not in (labels[0], labels[3])
    # labels ordered by center
    assert labels[0] < labels[3] < labels[5]


def test_reconstruct_tables_known_grid(spark):
    # 2 rows × 2 columns, with jitter below the adaptive threshold
    rows = []
    idx = 0
    for r, y in enumerate([100.0, 140.0]):
        for c, x in enumerate([50.0, 200.0]):
            for k in range(2):  # two tokens per cell
                rows.append(
                    (
                        "u1",
                        1,
                        "t1",
                        idx,
                        f"w{r}{c}{k}",
                        x + 10.0 * k,
                        y + 1.0 * k,
                        x + 8.0 + 10.0 * k,
                        y + 11.0 + 1.0 * k,
                        0.9 if (r, c) != (1, 1) else 0.5,
                    )
                )
                idx += 1
    df = spark.createDataFrame(
        rows,
        "url string, page_num int, region_id string, token_idx int, text string, "
        "x1 double, y1 double, x2 double, y2 double, confidence double",
    )
    cells = reconstruct_tables(df).orderBy("row_idx", "col_idx").collect()
    assert len(cells) == 4
    grid = {(c["row_idx"], c["col_idx"]): c for c in cells}
    assert grid[(0, 0)]["cell_text"] == "w000 w001"
    assert grid[(1, 1)]["cell_text"] == "w110 w111"
    assert grid[(1, 1)]["needs_review"] is True
    assert grid[(0, 0)]["needs_review"] is False
    assert grid[(0, 1)]["confidence"] == 0.9
