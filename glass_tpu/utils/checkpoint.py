"""Checkpoint / resume for parameter pytrees and training state.

The reference persists only the SSL embedding table and optuna studies
(SURVEY.md §5); a production framework needs real model checkpointing. Two
formats:

- orbax (preferred when installed): full async-capable checkpointing of any
  pytree, the standard JAX ecosystem choice;
- npz fallback: flattened pytree leaves with their tree paths as keys —
  dependency-free, portable, and sufficient for every model in this repo.

The SSL embedding-table contract (``{name}_{hidden}.npz`` with key
'embedding') is separate and intentionally simpler — see cli/gnn_emb.py.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import numpy as np
import jax


def atomic_savez(path: Path, **arrays) -> None:
    """np.savez via a same-directory temp file + os.replace, so a kill mid-
    write can never leave a truncated .npz at the final path (a corrupted
    resume checkpoint would crash every subsequent --resume attempt)."""
    # the temp name must keep the .npz suffix — np.savez appends one otherwise
    tmp = path.with_name(path.name + ".tmp.npz")
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def _path_key(path) -> str:
    """Stable on-disk key for a tree path. jax.tree_util.keystr formatting is
    not a serialization contract across JAX versions, so derive keys from the
    path entries directly (pinning the format to this repo)."""
    parts = []
    for entry in path:
        if hasattr(entry, "key"):  # DictKey
            parts.append(str(entry.key))
        elif hasattr(entry, "idx"):  # SequenceKey
            parts.append(str(entry.idx))
        elif hasattr(entry, "name"):  # GetAttrKey / FlattenedIndexKey
            parts.append(str(entry.name))
        else:
            parts.append(str(entry))
    return "/" + "/".join(parts)


def _flatten(tree: Any):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {_path_key(path): np.asarray(leaf) for path, leaf in leaves}


def save_checkpoint(path: str | Path, tree: Any) -> None:
    """Saves a pytree. Directory path -> orbax (if installed); '.npz' -> npz."""
    path = Path(path)
    if path.suffix == ".npz":
        path.parent.mkdir(parents=True, exist_ok=True)
        atomic_savez(path, **_flatten(tree))
        return
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path.absolute(), tree, force=True)
    except ImportError:
        atomic_savez(path.with_suffix(".npz"), **_flatten(tree))


def save_run_state(
    path: str | Path,
    *,
    params: Any,
    opt_state: Any,
    plateau: Any,
    rng_key: Any,
    np_rng: Any,
    epoch: int,
    val_score: float,
    tst_best: float,
    early_stop: int,
) -> None:
    """Full experiment-state checkpoint: everything needed to resume a
    training run bit-exactly — params, optimizer state, plateau-scheduler
    state, the jax PRNG key, the *numpy* Generator state (batch shuffles and
    eval permutations draw from it), and the protocol counters.

    The reference has no checkpointing at all (SURVEY.md §5); this is the
    production-framework surface for kill-and-resume."""
    import json

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tree = dict(
        params=params,
        opt_state=opt_state,
        plateau=tuple(plateau),
        rng_key=rng_key,
    )
    flat = _flatten(tree)
    flat["__meta__"] = np.asarray(
        json.dumps(
            dict(
                epoch=int(epoch),
                val_score=float(val_score),
                tst_best=float(tst_best),
                early_stop=int(early_stop),
                np_rng=np_rng.bit_generator.state,
            )
        )
    )
    atomic_savez(path, **flat)


def load_run_state(path: str | Path, *, params, opt_state, plateau, rng_key, np_rng):
    """Restores a run-state checkpoint into the given templates. Mutates
    ``np_rng`` in place (bit_generator state) and returns
    (params, opt_state, plateau, rng_key, meta_dict)."""
    import json

    like = dict(
        params=params, opt_state=opt_state, plateau=tuple(plateau), rng_key=rng_key
    )
    tree = load_checkpoint(path, like)
    meta = json.loads(str(np.load(path, allow_pickle=False)["__meta__"]))
    np_rng.bit_generator.state = meta.pop("np_rng")
    plateau = type(plateau)(*tree["plateau"])
    return tree["params"], tree["opt_state"], plateau, tree["rng_key"], meta


def load_checkpoint(path: str | Path, like: Any) -> Any:
    """Loads a checkpoint into the structure of ``like`` (shape template)."""
    path = Path(path)
    if path.suffix != ".npz" and path.is_dir():
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(path.absolute(), item=like)
    if path.suffix != ".npz":
        path = path.with_suffix(".npz")
    data = np.load(path)
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for p, leaf in leaves_paths:
        key = _path_key(p)
        if key not in data:
            # accept checkpoints written before the stable-key format
            legacy = jax.tree_util.keystr(p)
            if legacy in data:
                key = legacy
            else:
                raise KeyError(f"checkpoint missing {key}")
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"{key}: checkpoint shape {arr.shape} != {np.shape(leaf)}")
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
