"""Device mesh + sharding helpers (data parallelism over ICI).

Replaces the reference's DDP/NCCL stack (``train.py:60-67``,
``modules/detection.py:319-329``): instead of gradient-bucket all-reduce,
the batch is sharded over a 1-D ``dp`` mesh axis and parameters are
replicated; XLA inserts the gradient psum inside the jitted train step.
Metric reduction is a jnp.mean over the same sharded values — no separate
backend, no barrier calls.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts (DCN between hosts, ICI within).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(dp_size: int = -1, devices: Optional[Sequence[jax.Device]] = None
              ) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp_size == -1:
        dp_size = len(devices)
    assert 1 <= dp_size <= len(devices), (dp_size, len(devices))
    return Mesh(np.asarray(devices[:dp_size]), (DP_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across dp."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, *arrays) -> tuple:
    """Place host arrays with the batch axis sharded over dp."""
    sh = batch_sharding(mesh)
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    rep = replicated(mesh)
    return jax.device_put(tree, rep)


def shard_states(mesh: Mesh, states: Any) -> Any:
    """LSTM states carry a leading batch axis -> dp-sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), states)
