import sys, time, os, gc
root = sys.argv[1]
sys.path.insert(0, root)
os.chdir(root)
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
import pyspark.sql.functions as F
from solr_map_reduce_spark.queries import registry, _docs_search_index, _nested_orders_index, _embeddings_ann_index
from solr_map_reduce_spark.session import get_spark
import bench as benchmod

spark = get_spark(app_name="smrs-ab", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
reg = registry()

def _force(df):
    df.write.mode("overwrite").format("noop").save()

# bench-identical warmups
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.range(CPUS).repartition(CPUS).mapInPandas(lambda it: it, "id long").count()
for t in ("lineitem","orders","customer","events","documents","embeddings","nation","region","supplier","part"):
    spark.read.parquet(f"{SF_DIR}/{t}.parquet").select(F.lit(1)).limit(1).collect()
warm_dir = "/root/testdata/sf0.001"
for name in benchmod.BENCH_QUERIES:
    try:
        _force(reg[name].spark(spark, warm_dir))
    except Exception:
        pass
_docs_search_index(spark, SF_DIR)
_nested_orders_index(spark, SF_DIR)
_embeddings_ann_index(spark, SF_DIR)
benchmod._release_leftovers(spark)
print("READY", flush=True)

def one_rep(name):
    if name == "index_build_lineitem":
        return benchmod.bench_index_build(spark, SF_DIR)
    t0 = time.perf_counter()
    _force(reg[name].spark(spark, SF_DIR))
    return time.perf_counter() - t0

for line in sys.stdin:
    line = line.strip()
    if not line or line == "Q":
        break
    cmd, name = line.split(None, 1)
    if cmd == "G":
        pass
    t = one_rep(name)
    if cmd == "T":
        print(f"TIME {t:.4f}", flush=True)
    else:
        print("WARM", flush=True)
    benchmod._release_leftovers(spark)
print("BYE", flush=True)
spark.stop()
