"""Z-order clustering: Morton-key math vs a Python reference, and the
actual data-skipping payoff measured from parquet row-group statistics."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from parquet_converters_spark.operators.zorder import write_zordered, zorder_key


def _py_morton(vals, bits):
    out = 0
    k = len(vals)
    for b in range(bits):
        for i, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * k + i)
    return out


def test_zorder_key_matches_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 170, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=8)).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_morton([x, y], 8), (x, y)


def _groups_touched(path, col, lo, hi):
    """Row groups whose [min,max] stats overlap [lo, hi] — what a
    reader's predicate pushdown would have to scan."""
    touched = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if st.max >= lo and st.min <= hi:
                touched += 1
    return touched, total


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """x-sorted layout prunes x-predicates perfectly and y-predicates
    not at all; the z-ordered layout prunes BOTH partially — the
    trade a multi-dimensional workload wants."""
    grid = (
        spark.range(256)
        .withColumnRenamed("id", "x")
        .crossJoin(spark.range(256).withColumnRenamed("id", "y"))
    )
    xs_path = str(tmp_path / "xsorted")
    (
        grid.repartitionByRange(4, "x")
        .sortWithinPartitions("x", "y")
        .write.option("parquet.block.size", str(8 * 1024))
        .option("parquet.page.size", str(2 * 1024))
        .parquet(xs_path)
    )
    z_path = str(tmp_path / "zordered")
    write_zordered(
        grid, z_path, ["x", "y"], bits=8, num_files=4,
        row_group_bytes=8 * 1024,
    )

    # y-box predicate: the single-column layout cannot prune at all
    # (fraction thresholds with margin — repartitionByRange samples its
    # boundaries, so exact group counts vary slightly run to run)
    y_xs, total_xs = _groups_touched(xs_path, "y", 0, 31)
    y_z, total_z = _groups_touched(z_path, "y", 0, 31)
    assert total_xs >= 6 and total_z >= 6  # enough groups to be meaningful
    assert y_xs == total_xs               # x-sorted: every group spans all y
    assert y_z <= 0.6 * total_z, (y_z, total_z)  # z: real y-pruning

    # x-box predicate: z-order trades some x-pruning away but keeps most
    x_xs, _ = _groups_touched(xs_path, "x", 0, 31)
    x_z, _ = _groups_touched(z_path, "x", 0, 31)
    assert x_xs < total_xs
    assert x_z <= 0.6 * total_z, (x_z, total_z)
