"""Boundary drive for r13 change 8 (adaptive bloom width + refresh
adoption): build from the package boundary, serve with pruning, mutate via
merge_into, and cross-check every step against DuckDB / a fresh rebuild."""
import sys

sys.path.insert(0, "/root/repo")
import tempfile

import duckdb
import pyspark.sql.functions as F

from solr_map_reduce_spark import term_blooms as tb
from solr_map_reduce_spark.index_reader import SearchIndex
from solr_map_reduce_spark.indexing import IndexJob, IndexJobConfig
from solr_map_reduce_spark.schema import Field, IndexSchema
from solr_map_reduce_spark.session import get_spark

spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
fails = []


def check(name, cond):
    print(("ok  " if cond else "FAIL") + " " + name, flush=True)
    if not cond:
        fails.append(name)


docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
    "doc_id", "text", "lang", "source", "n_chars"
)
schema = IndexSchema(
    fields=(
        Field("doc_id", "long", required=True),
        Field("text", "text_general"),
        Field("lang", "string"),
        Field("source", "string"),
        Field("n_chars", "long"),
    ),
    unique_key="doc_id",
)
out = tempfile.mkdtemp(prefix="smrs_bloomdrive_") + "/index"

# force the adaptive path at fixture scale (gate 0 + inflated bits/term so
# the tiny vocab outgrows the 2^16 floor)
tb._ADAPTIVE_BLOOM_MIN_BYTES = 0
tb._BLOOM_BITS_PER_TERM = 200_000

job = IndexJob(
    IndexJobConfig(
        schema=schema, shards=4, micro_shards=8, dedup="none",
        routing="native", term_blooms=True, search_stats=True,
        key_ranges=True,
    )
)
job.build(docs, out)
blooms = tb.load_term_blooms(spark, out)
m0 = blooms["text"]["m"]
check(f"adaptive width grew past floor (m={m0})", m0 > tb.DEFAULT_M)
check("width is a power of two <= cap",
      m0 & (m0 - 1) == 0 and m0 <= tb.MAX_M)

idx = SearchIndex.open(spark, out)
con = duckdb.connect()
con.sql(
    "CREATE VIEW docs AS SELECT * FROM "
    "read_parquet('/root/testdata/sf0.001/documents.parquet')"
)

TOK = "regexp_split_to_array(lower(text), '[^a-z0-9]+')"


def oracle_ids(term):
    return {
        r[0]
        for r in con.sql(
            f"SELECT doc_id FROM docs WHERE list_contains({TOK}, '{term}')"
        ).fetchall()
    }


# serving parity vs DuckDB for several terms through the ADAPTIVE sidecar
for term in ("table", "vector", "shuffle", "spark"):
    got = {r["doc_id"] for r in idx.search(q=term, limit=10_000).collect()}
    check(f"search({term!r}) == duckdb oracle ({len(got)} rows)",
          got == oracle_ids(term))

# pruning still fires: a term present in few shards prunes the scan
rare = idx.contains_all(["zzz_not_a_term"])
check("absent term serves empty", rare.count() == 0)

# merge_into touched-shard refresh must ADOPT the stored adaptive width
upd = docs.limit(5).withColumn("n_chars", F.col("n_chars") + 1)
job.merge_into(upd, out)
blooms2 = tb.load_term_blooms(spark, out)
check("refresh adopted stored adaptive m (no escalation)",
      blooms2["text"]["m"] == m0)
check("every shard still present after refresh",
      set(blooms2["text"]["shards"]) == set(blooms["text"]["shards"]))

# post-mutation sidecar == fresh full rebuild at the same params
fresh = tb.write_term_blooms(spark, out, m=m0)
check("refreshed sidecar == fresh rebuild at same m",
      fresh["text"]["shards"] == tb.load_term_blooms(spark, out)["text"]["shards"])

# serving parity again AFTER the mutation round-trip
idx2 = SearchIndex.open(spark, out)
for term in ("table", "vector"):
    got = {r["doc_id"] for r in idx2.search(q=term, limit=10_000).collect()}
    check(f"post-mutation search({term!r}) == oracle", got == oracle_ids(term))

print(("ALL OK" if not fails else f"FAILURES: {fails}"), flush=True)
sys.exit(1 if fails else 0)
