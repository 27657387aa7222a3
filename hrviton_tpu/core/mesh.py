"""Device mesh and sharding helpers — the framework's communication backend.

Replaces the reference's in-process DataParallel + threaded SyncBN machinery
(/root/reference/sync_batchnorm/, train_generator.py:171-178) with the TPU-native
design: a named `jax.sharding.Mesh` ('data' for batch sharding, 'model' reserved
for tensor parallelism), GSPMD-compiled collectives over ICI/DCN.

Under `jax.jit` with batch-sharded inputs, any cross-batch reduction (BatchNorm
moments, loss means, gradient sums) is automatically a cross-replica collective;
no NCCL/MPI translation layer exists or is needed (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "batch_sharding",
           "replicated", "shard_batch", "shard_eval_batch",
           "init_distributed", "local_batch_size"]


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (jax.distributed); no-op for single host."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(devices: Optional[Sequence] = None, model_axis: int = 1) -> Mesh:
    """Build a (data, model) mesh over all (or the given) devices.

    model_axis=1 puts every device on the data axis — the reference's only
    parallelism strategy is data parallel (SURVEY.md §2.2); the model axis is a
    first-class citizen so tensor-parallel shardings can be annotated later
    without re-plumbing.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_axis:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int) -> int:
    """Samples each process must feed shard_batch (== global on single host)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    return global_batch // n


def shard_batch(mesh: Mesh, tree):
    """Build batch-sharded global device arrays from process-local host data.

    Single process: a plain device_put with the batch axis sharded over
    'data'. Multi-host: each process passes only its OWN local_batch_size()
    samples; jax.make_array_from_process_local_data assembles the global
    array so every process's samples land on its local devices and no full
    global batch ever materializes on one host (the DCN-correct replacement
    for the reference's single-host DataParallel scatter,
    train_generator.py:171-178).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def shard_eval_batch(mesh: Mesh, tree):
    """shard_batch for eval/vis paths whose batch size needn't divide the
    data axis (lpips_batch, num_test_visualize, val remainders).

    The training batch is validated up front; eval batches are whatever the
    flags say. When the batch divides the data axis this is shard_batch;
    otherwise (single process) the batch is replicated — correct, merely not
    parallel. Multi-process non-divisible batches cannot be replicated
    consistently from local shards, so that case raises with a fix hint.
    """
    n_data = mesh.shape[DATA_AXIS]
    leaves = jax.tree_util.tree_leaves(tree)
    bs = leaves[0].shape[0] if leaves else 0
    if bs % max(n_data, 1) == 0:
        return shard_batch(mesh, tree)
    if jax.process_count() > 1:
        raise ValueError(
            f"eval batch {bs} not divisible by data axis {n_data} on a "
            f"multi-host mesh; pick an eval batch (--lpips_batch / "
            f"--num_test_visualize / val batch) that is a multiple of "
            f"{n_data}")
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
