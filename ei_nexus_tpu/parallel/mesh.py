"""Device mesh + sharding utilities.

TPU-native replacement for the reference's torch.distributed stack
(train_extractor.py:83-91 init_process_group, utils/common.py:41 DDP wrap,
:53 env rendezvous, DistributedSampler batch split):

 - `distributed_init` wraps `jax.distributed.initialize` (multi-host
   rendezvous over DCN; no-op single-host);
 - `make_mesh` builds a `jax.sharding.Mesh` over ("data", "model") axes —
   gradient all-reduce over the data axis is inserted by XLA inside the
   jitted train step and rides ICI;
 - `shard_batch`/`replicate` place host numpy batches/params on the mesh
   (`jax.make_array_from_process_local_data` handles the per-host shard in
   multi-process runs).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host rendezvous (replaces dist.init_process_group). Safe to
    skip in single-process runs."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over (data, model) axes; data defaults to all remaining
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh (params, opt state)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host-local numpy batch with the leading axis sharded over
    `data`. In multi-process runs each host contributes its local shard."""
    sharding = data_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
