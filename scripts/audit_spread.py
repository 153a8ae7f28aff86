"""Registry-wide audit: count spread (REPARTITION_BY_NUM) exchanges per
partition key in every query's formatted plan; flag >1 per key."""
import re, sys
sys.path.insert(0, "/root/repo")
from parquet_converters_spark.queries import QUERIES
from parquet_converters_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(app_name="audit_spread", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

pat = re.compile(r"hashpartitioning\((\w+)#\d+[^)]*\), REPARTITION_BY_NUM")
bad = 0
for name, (fn, _sql) in QUERIES.items():
    try:
        df = fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception as e:
        print(f"{name}: ERR {str(e)[:60]}", flush=True)
        continue
    keys = pat.findall(plan)
    counts = {}
    for k in keys:
        counts[k] = counts.get(k, 0) + 1
    multi = {k: c for k, c in counts.items() if c > 1}
    if multi:
        bad += 1
        print(f"{name}: {multi} (total Exchange {plan.count('Exchange')})", flush=True)
print(f"-- done, {bad} queries with >1 spread exchange per key", flush=True)
