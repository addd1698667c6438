"""Tensor-parallel parameter sharding over a 2-D (data, model) mesh.

SURVEY.md §2.7: the reference has no TP (models are 10-24 M params); this is
the optional scale-out for the wide FFN weights — ConvNeXt pwconv1/pwconv2
(the WaveNeXt trunk's 384x1152 pairs) and transformer/conformer FFNs shard
their hidden dimension over the `model` axis. With params placed via
NamedSharding, XLA partitions the matmuls and inserts the all-reduce after
pwconv2 automatically — no hand-written collectives (GSPMD).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_2d_mesh(n_data: int, n_model: int) -> Mesh:
    devices = np.asarray(jax.devices()[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def _spec_for(path: tuple, leaf) -> P:
    """Sharding rule by parameter path.

    - pwconv1 / ffn w_1 style (C, I) kernels: shard I (column parallel)
    - pwconv2 / ffn w_2 style (I, C) kernels: shard I (row parallel)
    - matching biases of the column-parallel layer: shard
    - everything else: replicated
    """
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(names)
    if "pwconv1" in joined or "/w_1" in joined or "linear_1" in joined:
        if names[-1] == "kernel" and leaf.ndim >= 2:
            return P(*([None] * (leaf.ndim - 1) + ["model"]))
        if names[-1] == "bias":
            return P("model")
    if "pwconv2" in joined or "/w_2" in joined or "linear_2" in joined:
        if names[-1] == "kernel" and leaf.ndim >= 2:
            return P(*(["model"] + [None] * (leaf.ndim - 1)))
    return P()


def shard_params_tp(params, mesh: Mesh):
    """Place a generator param tree on the mesh with model-parallel FFNs."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, NamedSharding(mesh, _spec_for(path, x))), params
    )


def replicate_tp(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
