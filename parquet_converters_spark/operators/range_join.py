"""Point-in-interval (range) join without the cross product.

Spark has no native interval join: ``L JOIN R ON L.p >= R.lo AND
L.p < R.hi`` plans as a broadcast-nested-loop (or worse, a cartesian
product) — O(|L|·|R|) comparisons, a non-starter at scale.  The
standard distributed fix (used by every interval-join engine —
Flink's interval join, range-bucketed joins in genomics stacks) is
*bucketization*:

1. pick a bucket width ``w`` close to the typical interval length;
2. explode each interval [lo, hi) to the buckets it covers —
   ``floor(lo/w) .. floor((hi-1)/w)`` — expansion factor
   ~ ``len/w + 1``;
3. map each point to its single bucket ``floor(p/w)``;
4. equi-join on (bucket + any caller equi-keys) — a plain shuffled
   hash join Catalyst can plan, prune, and AQE-skew-split;
5. re-check the precise containment predicate post-join.

Cost: one shuffle on (bucket, keys) each side at ~(1 + len/w)×
interval replication, instead of |L|·|R|.  Every candidate pair
shares a bucket, so the residual filter only discards near misses.
Points that fall in no interval drop out (inner semantics); recover
them with a ``left_anti`` against the result if needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HELPERS = ("_bucket", "_lo", "_hi", "_pt")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    equi_keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join each ``points`` row to every ``intervals`` row with
    ``lo <= point < hi`` (plus optional same-named equi-keys), via
    bucketized equi-join.

    ``point_col``/``lo_col``/``hi_col`` must be integral (cast
    timestamps with ``unix_micros`` etc. first); ``bucket_width`` is in
    the same unit.  Output carries every ``points`` column plus every
    ``intervals`` column except the equi-keys (already present from the
    points side).

    Bucket ids are computed with ``floor(x / w)`` in double math, exact
    while |x| < 2^53 — true for any epoch-micros timestamp for the next
    ~250 years; pre-scale (e.g. to seconds) if your domain exceeds it.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = list(equi_keys or [])
    clashes = set(_HELPERS) & (set(points.columns) | set(intervals.columns))
    if clashes:
        raise ValueError(f"reserved helper columns in input: {sorted(clashes)}")
    overlap = (set(points.columns) - set(keys)) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both sides; "
            "rename before joining"
        )

    def _bkt(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width)).cast("long")

    lhs = points.withColumn("_pt", F.col(point_col).cast("long")).withColumn(
        "_bucket", _bkt(F.col("_pt"))
    )
    iv = intervals.withColumn("_lo", F.col(lo_col).cast("long")).withColumn(
        "_hi", F.col(hi_col).cast("long")
    )
    # explode each interval onto every bucket it overlaps; sequence() is
    # codegen'd JVM-side, expansion ~ len/width + 1
    rhs = iv.withColumn(
        "_bucket",
        F.explode(F.sequence(_bkt(F.col("_lo")), _bkt(F.col("_hi") - F.lit(1)))),
    )
    cond = [lhs["_bucket"] == rhs["_bucket"]] + [lhs[k] == rhs[k] for k in keys]
    contained = (lhs["_pt"] >= rhs["_lo"]) & (lhs["_pt"] < rhs["_hi"])
    joined = lhs.join(rhs, cond + [contained], "inner")
    rhs_keep = [c for c in intervals.columns if c not in keys]
    return joined.select(
        *[lhs[c] for c in points.columns],
        *[rhs[c] for c in rhs_keep],
    )


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
    equi_keys: list[str] | None = None,
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair with
    ``l.lo < r.hi AND r.lo < l.hi`` (half-open overlap), via the same
    bucketization as :func:`bucketed_range_join` applied to BOTH sides.

    Each side explodes onto its covering buckets; overlapping intervals
    share at least one bucket, so the equi-join on (bucket + keys)
    generates every candidate; the exact overlap predicate filters, and
    a distinct collapses pairs that co-occur in several buckets.
    Cost: one shuffle per side at ~(1 + len/width)x replication —
    never |L|·|R|.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = list(equi_keys or [])
    clashes = set(_HELPERS) & (set(left.columns) | set(right.columns))
    if clashes:
        raise ValueError(f"reserved helper columns in input: {sorted(clashes)}")
    overlap_cols = (set(left.columns) - set(keys)) & set(right.columns)
    if overlap_cols:
        raise ValueError(
            f"non-key columns {sorted(overlap_cols)} exist on both sides; "
            "rename before joining"
        )

    def _bkt(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width)).cast("long")

    def _explode(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn("_lo", F.col(lo).cast("long")).withColumn(
            "_hi", F.col(hi).cast("long")
        ).withColumn(
            "_bucket",
            F.explode(
                F.sequence(_bkt(F.col("_lo")), _bkt(F.col("_hi") - F.lit(1)))
            ),
        )

    lhs = _explode(left, left_lo, left_hi)
    rhs = (
        _explode(right, right_lo, right_hi)
        .withColumnRenamed("_lo", "_rlo")
        .withColumnRenamed("_hi", "_rhi")
    )
    cond = [lhs["_bucket"] == rhs["_bucket"]] + [lhs[k] == rhs[k] for k in keys]
    overlaps = (lhs["_lo"] < rhs["_rhi"]) & (rhs["_rlo"] < lhs["_hi"])
    joined = lhs.join(rhs, cond + [overlaps], "inner")
    rhs_keep = [c for c in right.columns if c not in keys]
    return joined.select(
        *[lhs[c] for c in left.columns],
        *[rhs[c] for c in rhs_keep],
    ).distinct()
