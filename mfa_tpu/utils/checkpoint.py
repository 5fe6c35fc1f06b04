"""Model parameter save/load.

The reference is a stateless kernel library with no checkpointing
(SURVEY.md §5); the model/serving layers here need weights on disk. Plain
flattened-npz format: dependency-free, works for any params pytree of
arrays. Structure is validated against an initialized pytree on load. (For
sharded multi-host checkpoints, orbax can be layered on the same pytrees.)
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _leaf_paths(params: Any) -> list[str]:
    return [
        jax.tree_util.keystr(path)
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    ]


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' to extension-less paths; normalize so
    save_params/load_params round-trip on any path the caller gives."""
    return path if path.endswith(".npz") else path + ".npz"


def save_params(path: str, params: Any) -> None:
    flat, _ = jax.tree.flatten(params)
    path = _npz_path(path)
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    np.savez(
        path,
        __paths__=np.array(json.dumps(_leaf_paths(params))),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
    )


def load_params(path: str, like: Any) -> Any:
    """Load into the structure of `like` (an initialized params pytree)."""
    data = np.load(_npz_path(path))
    flat, treedef = jax.tree.flatten(like)
    saved_paths = json.loads(str(data["__paths__"]))
    if saved_paths != _leaf_paths(like):
        raise ValueError(
            "checkpoint structure mismatch: "
            f"{len(saved_paths)} saved leaves vs {len(flat)} expected"
        )
    restored = [
        jnp.asarray(data[f"leaf_{i}"], dtype=ref.dtype)
        for i, ref in enumerate(flat)
    ]
    return jax.tree.unflatten(treedef, restored)
