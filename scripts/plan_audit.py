"""Plan audit: build every queries() entry at sf0.01 and flag scale
antipatterns in the optimized plan."""
import sys
sys.path.insert(0, "/root/repo")
from graph_python_spark.session import get_spark
import __spark_entry__ as em

spark = get_spark(parallelism=8, shuffle_partitions=8)
qs = em.queries()
flags = {}
for name in sorted(qs):
    try:
        df = qs[name](spark, "/root/testdata/sf0.01")
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception as ex:
        flags[name] = [f"BUILD ERROR: {type(ex).__name__}: {str(ex)[:120]}"]
        continue
    hits = []
    if "CartesianProduct" in plan:
        hits.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan:
        hits.append(f"BNLJ x{plan.count('BroadcastNestedLoopJoin')}")
    nsp = plan.count("Exchange SinglePartition")
    if nsp:
        hits.append(f"SinglePartitionExchange x{nsp}")
    if hits:
        flags[name] = hits
print("==== FLAGS ====", flush=True)
for k, v in sorted(flags.items()):
    print(k, v, flush=True)
print(f"{len(flags)} flagged of {len(qs)}", flush=True)
spark.stop()
