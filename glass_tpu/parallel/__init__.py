from glass_tpu.parallel.mesh import make_mesh
from glass_tpu.parallel.partition import partition_graph, PartitionedGraph
from glass_tpu.parallel.train import ShardedTrainer
from glass_tpu.parallel.auto import AutoTrainer
