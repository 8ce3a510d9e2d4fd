import sys, time

sys.path.insert(0, "/root/repo")
from graft.session import get_spark
from graft.graph import Graph
from graft.io import (
    events_to_transcripts, transcripts_to_edges, actor_edges_to_long,
    read_table,
)
from graft.algos.community import (
    init_level, gather_neighbor_comm_weights, community_aggregates,
    _select_moves, _resolve_conflicts, _quality,
)
from graft.checkpoint import truncate
from pyspark.sql import functions as F

spark = get_spark("prof3", master="local[8]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
t = events_to_transcripts(read_table(spark, "/root/testdata/sf0.01", "events"))
e, _ = actor_edges_to_long(transcripts_to_edges(t))
g = Graph.from_undirected(e).cache()
g.edges.count()
lvl = init_level(g.edges)
edges = lvl.edges.persist()
edges.count()
vertices = truncate(lvl.vertices)

for it in range(14):
    t0 = time.time()
    gather = gather_neighbor_comm_weights(edges, vertices)
    comm_agg = community_aggregates(vertices)
    moves = _select_moves(vertices, gather, comm_agg, "cpm", 0.05, 1.0)
    commits = truncate(_resolve_conflicts(moves, edges, it, 1234))
    t1 = time.time()
    n = commits.count()
    t2 = time.time()
    nv = truncate(
        vertices.join(commits, "id", "left").select(
            "id", F.coalesce("new_community", "community").alias("community"),
            "agg_count", "k",
        )
    )
    t3 = time.time()
    q = _quality(edges, nv, "cpm", 0.05, 1.0)
    t4 = time.time()
    commits.unpersist()
    vertices.unpersist()
    vertices = nv
    t5 = time.time()
    ec = edges.count()
    t6 = time.time()
    print(
        f"sweep {it}: moves={n} commit={t1-t0:.2f} cnt={t2-t1:.2f} "
        f"apply={t3-t2:.2f} qual={t4-t3:.2f} edgecnt={t6-t5:.2f} "
        f"nparts={nv.rdd.getNumPartitions()} q={q:.3f}",
        flush=True,
    )
