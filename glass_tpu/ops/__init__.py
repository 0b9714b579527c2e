from glass_tpu.ops.graph import Graph, build_graph, degrees, normalized_edge_weight
from glass_tpu.ops.spmm import spmm, spmm_dense, spmm_segment
from glass_tpu.ops.segment import pool_subgraphs, mean_over_nodes, POOL_KINDS
from glass_tpu.ops.norm import graph_norm, graph_size_norm
from glass_tpu.ops.sddmm import sddmm, segment_softmax
from glass_tpu.ops.labeling import max_zero_one, pad2batch, batch2pad
