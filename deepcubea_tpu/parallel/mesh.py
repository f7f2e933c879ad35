"""Device-mesh construction and sharding rules.

The reference's entire distribution stack — nn.DataParallel training
(avi.py:200-202), per-GPU heuristic server processes with queue RPC
(nnet_utils.py:281-303), torch.multiprocessing worker pools
(updater.py:100-112) and directory-copy parameter distribution
(avi.py:121-126) — collapses into ONE single-program-multiple-data jit over
a `jax.sharding.Mesh` (SURVEY.md §2.3):

  axis "data"  : the batch axis of scramble generation, Bellman labeling and
                 the SGD minibatch — per-device PRNG streams feed a globally
                 sharded batch; gradient psum rides ICI.
  axis "model" : optional tensor parallelism over the wide hidden layer
                 (fc1/bn1 sharded on features, fc2 contracts over the shard,
                 XLA inserts the all-reduce). The net is small (~13M params),
                 so this exists for topology headroom, not necessity.

No NCCL/MPI/queues/sockets anywhere: XLA emits the collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """("data", "model") mesh over the first n devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def param_partition_spec(path: tuple, leaf) -> P:
    """Tensor-parallel layout for ResnetValueNet parameters.

    fc1 output features and its BatchNorm ride the "model" axis; fc2
    contracts over the sharded features (XLA all-reduces the partial sums);
    everything else is replicated.
    """
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    joined = "/".join(str(n) for n in names)
    if "fc1" in joined and "kernel" in joined:
        return P(None, "model")
    if "fc1" in joined and "bias" in joined:
        return P("model")
    if "bn1" in joined:
        return P("model")
    if "fc2" in joined and "kernel" in joined:
        return P("model", None)
    return P()


def param_shardings(mesh: Mesh, params):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_partition_spec(path, leaf)),
        params)


def shard_params(mesh: Mesh, params):
    return jax.device_put(params, param_shardings(mesh, params))
