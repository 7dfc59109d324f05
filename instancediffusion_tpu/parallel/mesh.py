"""Device mesh + sharding policy.

Replaces the reference's NCCL process-group data parallelism
(utils/dist.py:13-37, DDP wrap trainer.py:55-57) with a
`jax.sharding.Mesh`:

  * training: 1-D "data" mesh — batch sharded over ICI (intra-slice) and
    DCN (multi-slice); gradient sync is the psum XLA inserts for replicated
    params under jit (the DDP allreduce equivalent)
  * eval sampling: same batch sharding over images (the reference's
    `--num_jobs` job splitting, eval_local.py:173-177, becomes sharded
    batched denoising)
  * params are replicated; AdamW moments + EMA are ZeRO-1-sharded over
    'data' (parallel/zero.py — ~4.4GB of fp32 state becomes 4.4GB/N)
  * the "model" axis carries tensor parallelism of the transformer stack
    (parallel/tp.py: Megatron-style head/FF-column sharding via shard_map).
    At SD1.5 scale DP alone is the right default (ICI bandwidth is better
    spent on batch); TP is the lever for the larger family members
    (SDXL-Refiner 2.6B+) and HBM-tight serving

Multi-host: call jax.distributed.initialize() before mesh creation
(equivalent of init_process_group, utils/dist.py:29-34).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for activations/batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the leading axis sharded over 'data'."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)


def replicate_params(mesh: Mesh, params):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), params)
