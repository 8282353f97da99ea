from dream_gnn_tpu.graph.bipartite import BipartiteGraph, build_enc_graph  # noqa: F401
from dream_gnn_tpu.graph.knn import NormAdj, knn_sim_graph, feature_knn_graph  # noqa: F401
from dream_gnn_tpu.graph.coo import CooGraph, coo_from_dense  # noqa: F401
