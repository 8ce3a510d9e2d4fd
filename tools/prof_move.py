import sys, time

sys.path.insert(0, "/root/repo")
from graft.session import get_spark
from graft.graph import Graph
from graft.io import (
    events_to_transcripts, transcripts_to_edges, actor_edges_to_long,
    read_table,
)
from graft.algos.community import init_level, move_nodes

spark = get_spark("prof", master="local[8]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
t = events_to_transcripts(read_table(spark, "/root/testdata/sf0.01", "events"))
e, _ = actor_edges_to_long(transcripts_to_edges(t))
g = Graph.from_undirected(e).cache()
print("sym rows", g.edges.count(), flush=True)
lvl = init_level(g.edges)
lvl.edges = lvl.edges.persist()
t0 = time.time()


def on_sweep(it, n, v):
    print(f"  sweep {it}: moves={n} t={time.time()-t0:.1f}s", flush=True)


lvl2, tot = move_nodes(lvl, "cpm", gamma=0.05, max_sweeps=50, seed=1234,
                       on_sweep=on_sweep)
print("level0 moves", tot, "elapsed", round(time.time() - t0, 1), flush=True)
print("ncomms", lvl2.vertices.select("community").distinct().count(),
      flush=True)
