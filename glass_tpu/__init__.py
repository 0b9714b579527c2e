"""glass_tpu — a TPU-native framework for subgraph representation learning.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of GLASS
("GNN with Labeling Tricks for Subgraph Representation Learning", ICLR 2022;
reference implementation surveyed in SURVEY.md). Nothing here is a port: the
compute path is designed around the TPU's MXU/VPU and XLA's static-shape
compilation model:

- graphs are static-shape sorted-COO pytrees with an optional dense normalized
  adjacency so SpMM can run on the MXU (``ops.graph``, ``ops.spmm``),
- subgraph pooling is a dense masked gather-reduce, not a scatter
  (``ops.segment``),
- the zero-one labeling trick is computed inside jit from the padded subgraph
  matrix (``ops.labeling``),
- training runs whole epochs as a single ``lax.scan``-compiled XLA program
  (``train.loop``),
- multi-chip scaling is a ``jax.sharding.Mesh`` + ``shard_map`` node partition
  with XLA collectives (``parallel``).
"""

from glass_tpu.ops.graph import Graph, build_graph
from glass_tpu.ops.spmm import spmm
from glass_tpu.ops.segment import pool_subgraphs
from glass_tpu.ops.norm import graph_norm
from glass_tpu.ops.labeling import max_zero_one


def __getattr__(name):
    # lazy: serve pulls in the model/checkpoint stack, which ops-only users
    # (and the import-time-sensitive CLIs) shouldn't pay for
    if name == "Predictor":
        from glass_tpu.serve import Predictor

        return Predictor
    raise AttributeError(f"module 'glass_tpu' has no attribute {name!r}")


__version__ = "0.1.0"
