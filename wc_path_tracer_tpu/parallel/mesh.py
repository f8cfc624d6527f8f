"""Device mesh + distribution setup.

The reference is single-process single-GPU (SURVEY §2.6): its "communication
backend" is a timeline semaphore ordering submits on one device.  The
TPU-native equivalent is a 1-D data-parallel ``jax.sharding.Mesh`` over every
chip in the slice (and every host in the pod): rays/pixel-rows are sharded on
the ``dp`` axis, the scene pytree is replicated, and gradient synchronization
is a ``psum`` over ``dp`` riding ICI (intra-slice) / DCN (cross-host) — there
is no hand-rolled transport (SURVEY §5 distributed-communication entry).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host entry: thin wrapper over jax.distributed.initialize.

    On a real pod each host calls this before building the mesh; in
    single-process runs (tests, single chip) it is a no-op.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)


def make_mesh(devices=None, axis: str = DP_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicate_scene(scene, mesh: Mesh):
    """Place every scene leaf replicated on the mesh (the analog of the
    reference uploading scene buffers to its one GPU, BufferManager.jai:52)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(scene, sharding)


def replicated_spec(tree):
    """A matching pytree of fully-replicated PartitionSpecs."""
    return jax.tree.map(lambda _: P(), tree)
