"""Data-quality expectation checks — the validation gate a pipeline
runs before promoting a 100 TB batch (the reference performs the same
kind of up-front invariant checking on ingest: magic/version checks and
the 2^24 node-count guard in ``/root/reference/src/circuit/parquets.cpp``
and ``src/index/index.cpp:36``; this generalizes it to declarative
row-level rules).

Design for scale:

- every row-level rule is folded into ONE aggregation pass
  (``sum(CASE WHEN violated)`` with map-side partials) — adding a rule
  adds a column to the agg, never a second scan;
- the wide one-row aggregate is unpivoted to (rule, violations, total)
  rows driver-free via ``explode`` of a struct array (k rules → k rows,
  not k jobs);
- referential checks (orphaned foreign keys) are LEFT ANTI joins —
  broadcast when the parent key set is small, shuffle-hash otherwise;
  Spark handles the choice via AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def check_expectations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate named boolean expectations over ``df`` in a single
    aggregation pass.  Returns (rule, violations, total) — one row per
    rule, ``violations`` = rows where the rule is False or NULL.
    """
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        F.sum(
            F.when(F.coalesce(cond.cast("boolean"), F.lit(False)), 0).otherwise(1)
        ).alias(f"_v_{i}")
        for i, (_name, cond) in enumerate(rules.items())
    ]
    wide = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_v_{i}").alias("violations"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return wide.select(
        F.explode(pairs).alias("r"), F.col("_total").alias("total")
    ).select("r.rule", "r.violations", "total")


def check_referential(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str | None = None,
    rule_name: str | None = None,
) -> DataFrame:
    """Orphaned-foreign-key check: count child rows whose key has no
    match in parent.  Same (rule, violations, total) shape so it unions
    with ``check_expectations`` output."""
    pk = parent_key or child_key
    orphans = child.join(
        parent.select(F.col(pk).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    name = rule_name or f"referential_{child_key}"
    total = child.select(F.count(F.lit(1)).alias("total"))
    return (
        orphans.agg(F.count(F.lit(1)).alias("violations"))
        .crossJoin(total)
        .select(F.lit(name).alias("rule"), "violations", "total")
    )
