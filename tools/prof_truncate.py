import sys, time

sys.path.insert(0, "/root/repo")
from graft.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("prof2", master="local[8]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
edges = spark.range(3000).select(
    (F.col("id") % 161).alias("src"),
    ((F.col("id") * 7) % 161).alias("dst"),
    F.lit(1.0).alias("weight"),
).persist()
edges.count()
v = spark.range(161).select(
    F.col("id"), F.col("id").alias("community"),
    F.lit(1).alias("agg_count"), F.lit(1.0).alias("k"),
).localCheckpoint()

for it in range(15):
    t0 = time.time()
    g = (
        edges.join(v.select(F.col("id").alias("dst"),
                            F.col("community").alias("nc")), "dst")
        .groupBy("src", "nc").agg(F.sum("weight").alias("w"))
    )
    best = g.groupBy("src").agg(F.max(F.struct("w", "nc")).alias("t")) \
        .select(F.col("src").alias("id"), F.col("t.nc").alias("new_c"))
    nv = v.join(best, "id", "left").select(
        "id", F.coalesce("new_c", "community").alias("community"),
        "agg_count", "k",
    ).localCheckpoint()
    n = nv.count()
    old = v
    v = nv
    old.unpersist()
    print(f"iter {it}: t={time.time()-t0:.2f}s rows={n}", flush=True)
