"""Isolated doc_entropy timing: noop-sink min-of-3 at a given sf dir.

Usage: python scripts/bench_doc_entropy.py [sf_dir] [--plan-out PATH]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from otlp_cardinality_checker_spark.session import get_spark  # noqa: E402
import __spark_entry__ as e  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
plan_out = None
if "--plan-out" in sys.argv:
    plan_out = sys.argv[sys.argv.index("--plan-out") + 1]

spark = get_spark()
spark.sparkContext.setJobDescription("bench_doc_entropy")
df = e.q_doc_entropy(spark, sf_dir)
if plan_out:
    with open(plan_out, "w") as fh:
        fh.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
times = []
for _ in range(3):
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    times.append(time.monotonic() - t0)
print("doc_entropy noop min-of-3:", round(min(times), 3), [round(t, 3) for t in times])
