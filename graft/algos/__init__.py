from graft.algos.pagerank import pagerank  # noqa: F401
from graft.algos.components import connected_components  # noqa: F401
from graft.algos.lpa import label_propagation  # noqa: F401
from graft.algos.triangles import triangle_count, triangles_per_vertex  # noqa: F401
from graft.algos.louvain import louvain  # noqa: F401
from graft.algos.leiden import leiden  # noqa: F401
