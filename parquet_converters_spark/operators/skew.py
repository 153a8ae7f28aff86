"""Skew mitigation for hot join keys.

Spark's AQE (`skewJoin.enabled`, on in `session.get_spark`) splits
oversized shuffle partitions at runtime, but it only helps
sort-merge/shuffled-hash joins after the fact.  Salting attacks the
skew at plan time and also covers the cases AQE cannot: skewed
`groupBy` with high-cardinality combiners (collect_list/distinct) and
joins whose hot key is so dominant that one *key* (not one partition)
exceeds an executor.

``salted_join`` spreads each hot left-side key over ``n_salts``
sub-keys and replicates the right side ``n_salts`` times, so the hot
key's rows land on ``n_salts`` different reducers.  Replication cost
is |right| × n_salts — use it when the right side is small-ish but
too big (or too skew-correlated) to broadcast outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` and ``right`` on column ``on``, salting the
    left (skewed) side into ``n_salts`` sub-keys.

    Each left row gets one pseudo-random salt, the right side is
    exploded across all salts, and the join key becomes
    ``(on, salt)`` — result rows are identical to the plain join
    (each left row still matches each right row exactly once).
    ``how`` supports the left-preserving joins (inner/left); right
    joins would need the salting mirrored.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    reserved = {"_salt", f"_{on}_r"}
    clashes = reserved & (set(left.columns) | set(right.columns))
    if clashes:
        raise ValueError(
            f"salted_join reserves helper columns {sorted(reserved)}; "
            f"rename conflicting input columns {sorted(clashes)} first"
        )
    salt = (F.rand(42) * n_salts).cast("int")
    lhs = left.withColumn("_salt", salt)
    rhs = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    rhs = rhs.withColumnRenamed(on, f"_{on}_r")
    out = lhs.join(
        rhs,
        (lhs[on] == rhs[f"_{on}_r"]) & (lhs["_salt"] == rhs["_salt"]),
        how,
    )
    return out.drop("_salt", f"_{on}_r")


def two_stage_aggregate(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof count/sum aggregation: shuffle once on (key, salt)
    so a hot key's rows partial-aggregate on ``n_salts`` reducers,
    then combine the ``n_salts`` partials per key (tiny second
    shuffle).  For plain algebraic aggregates Spark's map-side
    partials usually suffice; this form is for when per-key state on
    a single reducer is the bottleneck."""
    salt = (F.rand(42) * n_salts).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(value).alias("_s"))
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n_rows"), F.sum("_s").alias("value_sum")
    )
