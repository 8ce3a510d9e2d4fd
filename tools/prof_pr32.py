import sys, time

sys.path.insert(0, "/root/repo")
from graft.session import get_spark
from graft.graph import Graph
from graft.checkpoint import truncate
from graft.algos.pagerank import pagerank
from bench import synth_powerlaw_edges

spark = get_spark("profpr32", master="local[32]")
pdf = synth_powerlaw_edges()
t0 = time.time()
g = Graph.from_undirected(spark.createDataFrame(pdf)).cache()
n = g.edges.count()
print(f"graph build {time.time()-t0:.1f}s rows={n}", flush=True)

t0 = time.time()
pagerank(g, fixed_iterations=1).count()
print(f"warm 1-iter: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
pagerank(g, fixed_iterations=5).count()
print(f"timed 5-iter: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
pagerank(g, fixed_iterations=5, truncate_every=1).count()
print(f"timed 5-iter truncate-every-1: {time.time()-t0:.1f}s", flush=True)
