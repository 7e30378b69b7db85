"""Device mesh + sharding layer.

The reference stack has no distributed-communication backend at all (SURVEY
§2.4; the closest thing is multiple CARLA servers on TCP ports,
reference: scripts/start_carla_servers.sh:2-3). Here multi-device scale is a
first-class axis instead:

  * one mesh axis, ``data``: environment batch, replay buffer, and learner
    batch are sharded over it; parameters are replicated and gradients are
    combined by XLA-inserted collectives (psum over ICI) when the jitted
    train step is given these shardings.
  * a second optional axis, ``model``, is reserved for intra-network sharding;
    the reference networks (11×32-filter CNN + 1024-wide MLPs) fit in one
    chip's HBM thousands of times over, so parity needs no model parallelism.

Everything goes through `jax.sharding.NamedSharding` + `jax.jit`: XLA lays
collectives onto ICI within a slice automatically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshSpec:
    """How many devices to lay on each mesh axis."""

    data: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


def make_mesh(spec: Optional[MeshSpec] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(data, model)`` mesh.

    With no arguments, uses every visible device on the data axis — the right
    default for env-batch data parallelism.
    """
    if devices is None:
        devices = jax.devices()
    if spec is None:
        spec = MeshSpec(data=len(devices), model=1)
    assert spec.num_devices <= len(devices), (
        f"mesh spec {spec} needs {spec.num_devices} devices, have {len(devices)}"
    )
    arr = np.asarray(devices[: spec.num_devices]).reshape(spec.data, spec.model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def shard_batch(mesh: Mesh, ndim_or_tree=1) -> NamedSharding:
    """Sharding that splits the leading (batch) dimension over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def put_sharded(tree, mesh: Mesh):
    """Device-put a pytree with leading-axis sharding over ``data``."""
    s = shard_batch(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def put_replicated(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    s = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def put_env_batch(tree, mesh: Mesh, num_envs: int):
    """Device-put a pytree whose leaves are either per-env batches (leading
    axis == num_envs → sharded over ``data``) or shared scalars/pointers
    (replicated). This is the production layout for env states and replay
    state in the training driver."""
    data_sh = shard_batch(mesh)
    repl = replicate(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, data_sh)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, tree)
