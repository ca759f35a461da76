"""Data parallelism over a device Mesh — compiler-emitted collectives.

TPU-native replacement for the reference's only distribution strategy:
``MultiprocessParallelUpdater`` (reference train.py:117-121), which forks one
process per GPU, runs batch-1 steps, and NCCL-all-reduces gradients. Here the
SAME single-program train step runs under ``jax.jit`` over a 1-D ``data``
mesh: the batch is sharded on its leading axis, parameters/optimizer state
are replicated, and XLA inserts the gradient all-reduce over ICI (within a
slice) / DCN (across hosts) automatically (SURVEY §5 "distributed backend").

Multi-host: each process feeds its local shard
(``jax.make_array_from_process_local_data``); the host pipeline shards the
dataset index by ``jax.process_index()``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices.

    Raises when fewer than ``n_devices`` exist — an "8-way" mesh that
    silently becomes 1-way would let multichip checks pass vacuously.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh({n_devices}): only {len(devices)} device(s) "
                f"available ({[str(d) for d in devices]}); for a virtual "
                "CPU mesh set XLA_FLAGS=--xla_force_host_platform_device_"
                f"count={n_devices} and JAX_PLATFORMS=cpu before jax "
                "initializes"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along the leading dim.

    Single-host: a plain sharded device_put. Multi-host: each process holds
    its LOCAL shard (the data loader already splits the dataset by
    ``jax.process_index()``) and the global array is assembled with
    ``make_array_from_process_local_data`` — no cross-host data movement.
    """
    multi_host = jax.process_count() > 1

    def put(x):
        if x is None:
            return None
        sharding = NamedSharding(mesh, P(axis, *([None] * (np.ndim(x) - 1))))
        if multi_host:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / train state) across the mesh.

    Multi-host: ``device_put`` rejects shardings with non-addressable
    devices, so each process contributes its (identical) full copy via
    ``make_array_from_process_local_data``. Typed PRNG keys can't pass
    through that host-array path directly; their raw key data is assembled
    and re-wrapped under a jit with a replicated out-sharding (an SPMD
    no-op program, so it is multi-host safe).
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        if x is None:
            return None
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            garr = jax.make_array_from_process_local_data(sharding, data)
            return jax.jit(
                jax.random.wrap_key_data, out_shardings=sharding
            )(garr)
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )

    return jax.tree.map(put, tree)


def make_parallel_train_step(cfg, model, mesh: Mesh, axis: str = "data",
                             image_size: tuple[int, int] | None = None):
    """The single-chip train step, jitted with DP shardings over ``mesh``.

    Returns ``(state, batch) -> (state, metrics)`` where ``state`` must be
    replicated (see :func:`replicate`) and ``batch`` sharded
    (:func:`shard_batch`). Gradient reduction compiles to one XLA all-reduce
    per parameter bucket over ICI — no NCCL, no process forking.
    """
    from maskrcnn_tpu.train.step import make_train_step

    step = make_train_step(cfg, model, image_size)
    repl = NamedSharding(mesh, P())

    def sharded_step(state, batch):
        # Constrain state to replicated so the partitioner commits to the DP
        # layout (batch arrives sharded via shard_batch); the gradient
        # all-reduce then materializes at the psum the partitioner inserts.
        state = jax.lax.with_sharding_constraint(state, repl)
        return step(state, batch)

    return jax.jit(sharded_step, donate_argnums=(0,))
