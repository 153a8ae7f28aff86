"""Measured read-side Bloom pruning at a given SF (r16 verdict item 2).

Writes the SF's lineitem through the canonical sink (hash-repartition
-> every row group spans nearly the full l_orderkey range, so min/max
zone maps cannot prune an in-range probe) with a split-block Bloom
filter on l_orderkey, then measures for in-range ABSENT keys (orderkey
gaps TPC-H leaves in 0..max) and PRESENT keys:

* bloom_scan_plan row-group skip rate (the repo's from-spec prober);
* Spark's own scan numOutputRows with parquet.filter.bloom.enabled
  on vs off (the reader consuming the filters natively);
* wall time per probe, both ways.

Usage: python scripts/bloom_read_probe.py [sf_dir] (default sf0.1)
"""
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from parquet_converters_spark.session import get_spark
from parquet_converters_spark.sinks.parquet_sink import write_canonical_parquet
from parquet_converters_spark.sources.parquet_bloom import bloom_scan_plan


def scan_rows(df):
    from parquet_converters_spark.sources.parquet_bloom import (
        scan_output_rows,
    )

    return scan_output_rows(df)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    li_path = os.path.join(sf_dir, "lineitem.parquet")
    con = duckdb.connect()
    kmax = con.execute(
        f"SELECT max(l_orderkey) FROM read_parquet('{li_path}')"
    ).fetchone()[0]
    absent = [r[0] for r in con.execute(
        f"""SELECT i FROM generate_series(0, {int(kmax)}) t(i)
            WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{li_path}')
                              WHERE l_orderkey = i) LIMIT 5""").fetchall()]
    present = [r[0] for r in con.execute(
        f"""SELECT DISTINCT l_orderkey FROM read_parquet('{li_path}')
            ORDER BY hash(l_orderkey) LIMIT 5""").fetchall()]
    spark = get_spark()
    base = tempfile.mkdtemp(prefix="bloomprobe_")
    out = os.path.join(base, "lineitem_bloom")
    li = spark.read.parquet(li_path)
    write_canonical_parquet(
        li.repartition(16), out,
        bloom_filter_columns=["l_orderkey"], metadata_sidecar=False,
    )
    import pyarrow.parquet as pq
    files = glob.glob(out + "/*.parquet")
    nrg = sum(pq.ParquetFile(f).num_row_groups for f in files)
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    print(f"sf_dir={sf_dir} files={len(files)} row_groups={nrg} rows={total}")
    print(f"absent probes: {absent}\npresent probes: {present}")

    plan = bloom_scan_plan(spark, out, "l_orderkey", absent).collect()
    skipped = sum(1 for r in plan if not r["keep"])
    print(f"planner ABSENT x{len(absent)}: skipped {skipped}/{len(plan)} "
          f"row groups ({100.0 * skipped / len(plan):.1f}%)")
    for key in present[:2]:
        p = bloom_scan_plan(spark, out, "l_orderkey", [key]).collect()
        kept = sum(1 for r in p if r["keep"])
        print(f"planner PRESENT k={key}: kept {kept}/{len(p)} row groups "
              f"({100.0 * (len(p) - kept) / len(p):.1f}% skipped)")

    hc = spark.sparkContext._jsc.hadoopConfiguration()
    for label, flag in (("off", "false"), ("on", "true")):
        hc.set("parquet.filter.bloom.enabled", flag)
        t0 = time.time()
        scanned = rows = 0
        for key in absent + present:
            d = spark.read.parquet(out).filter(F.col("l_orderkey") == key)
            rows += len(d.collect())
            scanned += scan_rows(d)
        dt = time.time() - t0
        print(f"spark bloom={label}: {len(absent) + len(present)} probes "
              f"scanned_rows={scanned} result_rows={rows} {dt:.2f}s")
    hc.unset("parquet.filter.bloom.enabled")


if __name__ == "__main__":
    main()
