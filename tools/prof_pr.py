import sys, time

sys.path.insert(0, "/root/repo")
from graft.session import get_spark
from graft.graph import Graph
from graft.checkpoint import truncate
from bench import synth_powerlaw_edges
from pyspark.sql import functions as F

spark = get_spark("profpr", master="local[8]",
                  extra_conf={"spark.sql.shuffle.partitions": "16"})
pdf = synth_powerlaw_edges()
g = Graph.from_undirected(spark.createDataFrame(pdf)).cache()
print("sym rows", g.edges.count(), flush=True)

t0 = time.time()
out_w = g.edges.groupBy("src").agg(F.sum("weight").alias("s"))
trans = (
    g.edges.join(out_w, "src")
    .select("src", "dst", (F.col("weight") / F.col("s")).alias("p"))
    .repartition("src")
    .persist()
)
n_trans = trans.count()
print(f"trans build: {time.time()-t0:.2f}s rows={n_trans}", flush=True)

verts = g.vertices().persist()
n = verts.count()
ranks = truncate(verts.select("id", F.lit(1.0 / n).alias("rank")))
for it in range(3):
    t0 = time.time()
    contrib = (
        trans.join(ranks, trans.src == ranks.id)
        .select(trans.dst.alias("id"), (F.col("rank") * F.col("p")).alias("c"))
        .groupBy("id")
        .agg(F.sum("c").alias("inflow"))
    )
    new_ranks = verts.join(contrib, "id", "left").select(
        "id",
        (F.lit(0.15 / n) + F.lit(0.85) * F.coalesce("inflow", F.lit(0.0))).alias("rank"),
    )
    t1 = time.time()
    nr = truncate(new_ranks)
    t2 = time.time()
    ranks = nr
    print(f"iter {it}: build={t1-t0:.2f}s truncate={t2-t1:.2f}s", flush=True)

contrib = (
    trans.join(ranks, trans.src == ranks.id)
    .select(trans.dst.alias("id"), (F.col("rank") * F.col("p")).alias("c"))
    .groupBy("id").agg(F.sum("c").alias("inflow"))
)
t0 = time.time(); contrib.count(); print(f"contrib only: {time.time()-t0:.2f}s", flush=True)
contrib.explain("formatted")
