"""Binary-in-JSON serialization helpers.

The reference checkpoints GPUMemory buffers as nlohmann binary blobs inside a
JSON document (gpu_memory_json.h:37-72, trainer.h:275-315). We mirror that
with base64-encoded little-endian arrays so checkpoints are plain JSON text.
"""

from __future__ import annotations

import base64

import jax
import jax.numpy as jnp
import numpy as np


def array_to_json(arr) -> dict:
    arr = np.asarray(arr)
    return {
        "dtype": arr.dtype.str,
        "shape": list(arr.shape),
        "data": base64.b64encode(np.ascontiguousarray(arr).tobytes()).decode(),
    }


def array_from_json(obj) -> np.ndarray:
    data = base64.b64decode(obj["data"])
    return np.frombuffer(data, dtype=np.dtype(obj["dtype"])).reshape(obj["shape"])


def tree_to_json(tree) -> dict:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return {
        "treedef": str(treedef),
        "leaves": [array_to_json(np.asarray(leaf)) for leaf in leaves],
    }


def tree_from_json(obj, like):
    """Rebuild a pytree with the structure of `like` from serialized leaves."""
    leaves, treedef = jax.tree_util.tree_flatten(like)
    stored = [array_from_json(o) for o in obj["leaves"]]
    if len(stored) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(stored)} leaves, expected {len(leaves)}"
        )
    new_leaves = [
        jnp.asarray(s).astype(l.dtype).reshape(l.shape)
        for s, l in zip(stored, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
