"""Device-mesh helpers for multi-chip scaling.

The reference is a single-process CPU codebase with no distributed layer
(SURVEY.md §2.4); this module is the new-design replacement: a 1-D scenario
mesh (data parallelism over independent MPC solves — robust-MPC scaling is
embarrassingly parallel) with room for a second axis if per-solve sharding is
ever wanted. Collectives ride ICI via jax.lax.psum inside shard_map.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXIS = "scenarios"


def scenario_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over `n_devices` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (SCENARIO_AXIS,))


def shard_batch(mesh: Mesh, tree):
    """Place a pytree with leading batch axis sharded across the mesh."""
    sharding = NamedSharding(mesh, P(SCENARIO_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec() -> P:
    return P(SCENARIO_AXIS)
