import sys, time

sys.path.insert(0, "/root/repo")
from graft.session import get_spark
from graft.graph import Graph
from graft.checkpoint import truncate
from bench import synth_powerlaw_edges
from pyspark.sql import functions as F

spark = get_spark("profpr2", master="local[8]",
                  extra_conf={"spark.sql.shuffle.partitions": "16"})
pdf = synth_powerlaw_edges()
t0 = time.time()
g = Graph.from_undirected(spark.createDataFrame(pdf)).cache()
g.edges.count()
print(f"graph build {time.time()-t0:.1f}s", flush=True)

out_w = g.edges.groupBy("src").agg(F.sum("weight").alias("s"))
trans = (
    g.edges.join(out_w, "src")
    .select("src", "dst", (F.col("weight") / F.col("s")).alias("p"))
    .persist()
)
trans.count()
verts = g.vertices().persist()
n = verts.count()
ranks = truncate(verts.select("id", F.lit(1.0 / n).alias("rank")))

for it in range(4):
    ta = time.time()
    j = trans.join(ranks, trans.src == ranks.id)
    tb = time.time()
    contrib = (
        j.select(trans.dst.alias("id"), (F.col("rank") * F.col("p")).alias("c"))
        .groupBy("id")
        .agg(F.sum("c").alias("inflow"))
    )
    tc = time.time()
    # symmetric graph: every vertex receives inflow -> no verts join
    new_ranks = contrib.select(
        "id",
        (F.lit(0.15 / n) + F.lit(0.85) * F.col("inflow")).alias("rank"),
    )
    td = time.time()
    nr = truncate(new_ranks)
    te = time.time()
    ranks = nr
    print(
        f"iter {it}: join={tb-ta:.2f} agg={tc-tb:.2f} sel={td-tc:.2f} "
        f"truncate={te-td:.2f}",
        flush=True,
    )
