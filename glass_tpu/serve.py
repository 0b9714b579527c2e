"""Inference/serving path: load a checkpoint, serve padded-bucket batches.

Production serving needs static shapes: requests arrive with ragged subgraph
sets, so the predictor pads each request batch up to a fixed (batch, width)
bucket and jit-compiles once per bucket. Everything else (graph, params)
is resident on device.

Example:
    predictor = Predictor.from_checkpoint(model, graph, x, "ckpt.npz",
                                          like_params=params)
    probs = predictor(subgraph_node_lists)
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from glass_tpu.ops.graph import Graph
from glass_tpu.ops.labeling import max_zero_one


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"batch of {n} exceeds the largest bucket {buckets[-1]}")


class Predictor:
    """Batched GLASS inference with shape-bucketed compilation."""

    def __init__(
        self,
        model,
        graph: Graph,
        x: jnp.ndarray,
        params,
        *,
        use_z: bool = True,
        batch_buckets: Sequence[int] = (1, 8, 64, 256),
        width_buckets: Sequence[int] = (16, 64, 256),
    ):
        self.model = model
        self.graph = graph
        self.x = x
        self.params = params
        self.use_z = use_z
        self.batch_buckets = tuple(batch_buckets)
        self.width_buckets = tuple(width_buckets)
        self._fns: dict = {}

    @classmethod
    def from_checkpoint(cls, model, graph, x, path, like_params, **kw):
        from glass_tpu.utils.checkpoint import load_checkpoint

        params = load_checkpoint(path, like_params)
        return cls(model, graph, x, params, **kw)

    def _fn(self, b: int, w: int):
        key = (b, w)
        if key not in self._fns:
            # graph/x as jit args, not closure constants (which would inline
            # the edge arrays into every bucket's HLO — see train/loop.py)
            def fwd(graph, x, params, pos):
                z = max_zero_one(pos, graph.n_node) if self.use_z else None
                return self.model.apply(params, graph, x, pos, z)

            self._fns[key] = jax.jit(fwd)
        return self._fns[key]

    def __call__(self, subgraphs: List[Sequence[int]]) -> np.ndarray:
        """Returns (len(subgraphs), C) logits."""
        n = len(subgraphs)
        width = max((len(s) for s in subgraphs), default=1)
        b = _bucket(n, self.batch_buckets)
        w = _bucket(width, self.width_buckets)
        pos = np.full((b, w), -1, dtype=np.int32)
        for i, s in enumerate(subgraphs):
            pos[i, : len(s)] = np.asarray(s, dtype=np.int32)
        logits = self._fn(b, w)(self.graph, self.x, self.params, jnp.asarray(pos))
        return np.asarray(logits)[:n]
