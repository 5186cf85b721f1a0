"""Parameter sharding rules for 2D (data x model) meshes.

The reference is pure data parallelism (SURVEY §2.6); this adds a tensor-
parallel axis the reference lacks: the transformer FFN hidden dimension
(2C*expansion = 1024 wide — the widest matmuls in the model) is sharded over
the `model` axis, with XLA inserting the all-reduce on the second FFN matmul
from the shardings alone. Everything else stays replicated — at UniMatch's
7 M parameters, DP is the right default and TP is provided for very large
inputs where activation memory dominates.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def param_specs(params: Any) -> Any:
    """PartitionSpec tree: FFN hidden dim sharded on 'model', rest replicated."""

    def spec_for(path: str, leaf) -> P:
        if "/mlp_0/kernel" in path:
            return P(None, "model")  # [in, hidden]: shard hidden
        if "/mlp_2/kernel" in path:
            return P("model", None)  # [hidden, out]: shard hidden
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = {id(leaf): "/".join(str(getattr(p, "key", p)) for p in path) for path, leaf in flat}

    def mapper(path, leaf):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        return spec_for(p, leaf)

    return jax.tree_util.tree_map_with_path(mapper, params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
