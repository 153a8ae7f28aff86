"""A/B graph_pagerank's checkpoint_every under the driver's protocol
(fresh JVM per invocation, one untimed warmup, min-of-3 noop-sink runs).

Usage: SPARK_GRAFT_CPUS=N python scripts/ab_pagerank.py SF_DIR CK

CK is an int or the literal `none`.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import parquet_converters_spark.operators.graph as _g  # noqa: E402
from parquet_converters_spark.queries import QUERIES  # noqa: E402
from parquet_converters_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    ck_arg = sys.argv[2]
    ck = None if ck_arg == "none" else int(ck_arg)

    _orig = _g.pagerank

    def patched(edges, **kw):
        kw["checkpoint_every"] = ck
        return _orig(edges, **kw)

    _g.pagerank = patched

    spark = get_spark(
        app_name=f"ab_pagerank_ck{ck_arg}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    fn = QUERIES["graph_pagerank"][0]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "ck": ck_arg,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "sec": round(best, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
