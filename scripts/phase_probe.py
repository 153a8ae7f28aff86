"""Split a query's wall time into build (fn call, incl. any eager
driver-side work), plan (Catalyst analyze+optimize+physical), and
execute (noop write) — min-of-N after one untimed warmup, mirroring
bench.py's protocol.

Usage: python scripts/phase_probe.py SF_DIR NAME [NAME...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_converters_spark.queries import QUERIES  # noqa: E402
from parquet_converters_spark.session import get_spark  # noqa: E402

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(
        app_name="phase_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    out = {}
    for name in names:
        fn = QUERIES[name][0]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = (float("inf"),) * 4
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            tot = (t3 - t0, t1 - t0, t2 - t1, t3 - t2)
            if tot[0] < best[0]:
                best = tot
        out[name] = {
            "total": round(best[0], 3),
            "build": round(best[1], 3),
            "plan": round(best[2], 3),
            "exec": round(best[3], 3),
        }
        print(name, json.dumps(out[name]), flush=True)


if __name__ == "__main__":
    main()
