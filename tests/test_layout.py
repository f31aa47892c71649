"""Z-order layout quality — sources/layout.py.

The s13 oracle entry proves the relayout is value-exact; these tests
prove it actually BUYS something: per-file min-max bounding boxes read
from the written parquet footers must be dramatically tighter than a
row-order write of the same data, which is exactly the statistic
file-skipping readers prune on.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mcp_trino_spark.sources.catalog import load_table
from mcp_trino_spark.sources.layout import write_zordered, zorder_frame

SF_DIR = "/root/testdata/sf0.01"
COLS = ("o_custkey", "o_totalprice")


def _file_bboxes(path: str, cols):
    """Per-file (min, max) per column from the parquet footers —
    the statistics a file-skipping reader prunes on."""
    boxes = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        if all(lo[c] is not None for c in cols):
            boxes.append({c: (lo[c], hi[c]) for c in cols})
    return boxes


def _mean_bbox_area(boxes, spans):
    areas = []
    for b in boxes:
        a = 1.0
        for c, (glo, ghi) in spans.items():
            lo, hi = b[c]
            a *= (hi - lo) / (ghi - glo) if ghi > glo else 0.0
        areas.append(a)
    return sum(areas) / len(areas)


def test_zorder_files_have_tight_bounding_boxes(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", *COLS
    )
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "row")
    write_zordered(orders, zpath, list(COLS), n_files=16)
    orders.repartition(16).write.mode("overwrite").parquet(rpath)

    g = orders.agg(
        *[F.min(c).alias(f"lo_{c}") for c in COLS],
        *[F.max(c).alias(f"hi_{c}") for c in COLS],
    ).collect()[0]
    spans = {c: (g[f"lo_{c}"], g[f"hi_{c}"]) for c in COLS}

    z_area = _mean_bbox_area(_file_bboxes(zpath, COLS), spans)
    r_area = _mean_bbox_area(_file_bboxes(rpath, COLS), spans)
    # a row-order/round-robin file spans ~the full box on both axes
    # (area ≈ 1); a Z-ordered file covers a compact cell.  Require a
    # wide, assumption-light margin.
    assert z_area < 0.25, f"z-order mean bbox area {z_area:.3f} not tight"
    assert z_area < r_area / 3, (z_area, r_area)


def test_zorder_preserves_rows_and_rejects_bad_arity(spark):
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", *COLS
    )
    out = zorder_frame(orders, list(COLS), n_files=8)
    assert out.columns == orders.columns  # helper columns dropped
    assert out.count() == orders.count()
    with pytest.raises(ValueError, match="2-4 columns"):
        zorder_frame(orders, ["o_custkey"], 8)
    # 3-D interleave: rows preserved, helpers dropped
    o3 = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out3 = zorder_frame(o3, ["o_orderkey", "o_custkey", "o_totalprice"], 8)
    assert out3.columns == o3.columns
    assert out3.count() == o3.count()


def test_zorder_scan_skips_files_for_box_predicates(spark, tmp_path):
    """End-to-end pruning effect: a selective 2-D box predicate over
    the Z-ordered layout must touch only the files whose footer bbox
    intersects the box — verified by counting candidate files from the
    footers (the skip decision a reader makes)."""
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", *COLS)
    zpath = str(tmp_path / "z2")
    write_zordered(orders, zpath, list(COLS), n_files=16)
    boxes = _file_bboxes(zpath, COLS)
    # a 10% × 10% box in the middle of the space
    g = orders.agg(
        *[F.min(c).alias(f"lo_{c}") for c in COLS],
        *[F.max(c).alias(f"hi_{c}") for c in COLS],
    ).collect()[0]
    pred_box = {}
    for c in COLS:
        lo, hi = g[f"lo_{c}"], g[f"hi_{c}"]
        mid = (lo + hi) / 2
        w = (hi - lo) * 0.05
        pred_box[c] = (mid - w, mid + w)
    touched = [
        b for b in boxes
        if all(b[c][0] <= pred_box[c][1] and b[c][1] >= pred_box[c][0]
               for c in COLS)
    ]
    # row-order would touch ~every file; the clustered layout must
    # skip a real fraction.  Margin note: repartitionByRange samples
    # its boundaries with an RDD-id-derived seed, so the exact file
    # grid varies per session — measured touched counts are 6-8 of 16
    # across runs, so the bound is set clear of that band (10), while
    # row-order reliably touches ~16.
    assert len(touched) <= 10, (len(touched), len(boxes))
    # and the layout returns exactly the right rows for the box
    back = spark.read.parquet(zpath)
    want = orders
    for c in COLS:
        back = back.filter(F.col(c).between(*pred_box[c]))
        want = want.filter(F.col(c).between(*pred_box[c]))
    assert back.count() == want.count()


def test_zorder_rejects_reserved_column_names(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(a=1, b=2, __z=3)])
    with pytest.raises(ValueError, match="reserves column names"):
        zorder_frame(df, ["a", "b"], 4)
