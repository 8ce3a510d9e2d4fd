from graft.algos.pagerank import pagerank  # noqa: F401
from graft.algos.components import connected_components  # noqa: F401
from graft.algos.lpa import label_propagation  # noqa: F401
from graft.algos.triangles import triangle_count, triangles_per_vertex  # noqa: F401
from graft.algos.louvain import louvain  # noqa: F401
from graft.algos.leiden import leiden  # noqa: F401
from graft.algos.ecg import ecg  # noqa: F401
from graft.algos.spectral import (  # noqa: F401
    pic_embedding,
    power_iteration_clustering,
)
from graft.algos.msf import (  # noqa: F401
    maximum_spanning_forest,
    minimum_spanning_forest,
    msf_total_weight,
)
from graft.algos.generators import rmat_edges  # noqa: F401
from graft.algos.bfs import bfs_hops  # noqa: F401
from graft.algos.jaccard import (  # noqa: F401
    adamic_adar,
    common_neighbors,
    overlap_coefficient,
    overlap_coefficient_w,
    preferential_attachment,
    resource_allocation,
    salton_index,
    sorensen_coefficient,
    sorensen_coefficient_w,
    vertex_jaccard,
    vertex_jaccard_w,
)
from graft.algos.structure import (  # noqa: F401
    avg_neighbor_degree,
    clustering_coefficient,
    degree_assortativity,
    reciprocity,
    four_clique_count,
    rich_club,
    square_count,
    transitivity,
)
from graft.algos.spreading import label_spreading  # noqa: F401
from graft.algos.kcore import core_number, k_core  # noqa: F401
from graft.algos.cascade import ic_spread  # noqa: F401
from graft.algos.linkpred import link_pred_auc  # noqa: F401
from graft.algos.sweepcut import ppr_sweep_cut  # noqa: F401
from graft.algos.ktruss import k_truss  # noqa: F401
from graft.algos.truss import truss_number  # noqa: F401
from graft.algos.centrality import (  # noqa: F401
    degree_centrality,
    eigenvector_centrality,
    hits,
    katz_centrality,
)
from graft.algos.scc import strongly_connected_components  # noqa: F401
from graft.algos.betweenness import (  # noqa: F401
    betweenness_centrality,
    edge_betweenness_centrality,
)
from graft.algos.closeness import (  # noqa: F401
    closeness_centrality,
    harmonic_centrality,
)
from graft.algos.walks import node2vec_walks, random_walks  # noqa: F401
from graft.algos.sampling import neighbor_sample  # noqa: F401
from graft.algos.mis import maximal_independent_set  # noqa: F401
from graft.algos.coloring import greedy_color  # noqa: F401
from graft.algos.wl import (  # noqa: F401
    conversation_wl_fingerprints,
    graph_fingerprint,
    wl_colors,
)
from graft.algos.subgraph import (  # noqa: F401
    ego_edges,
    quotient_edges,
    sparsify_top_k,
    two_hop_neighbors,
)
