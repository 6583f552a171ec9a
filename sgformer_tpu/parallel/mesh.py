"""Device-mesh construction helpers + multi-host bring-up.

The reference is strictly single-GPU (SURVEY.md §2.5,
``/root/reference/large/main.py:40-43``); this module adds the TPU-pod
layer it lacks: ``jax.distributed`` initialization, a DCN×ICI global
mesh builder, and per-host array feeding
(``jax.make_array_from_process_local_data``).  Validated by a 2-process
CPU cluster test (``tests/test_multihost.py``); see docs/MULTIHOST.md
for the production layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("sp",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Defaults to a 1-D node-sharding ("sp") mesh over every device.  Pass
    ``shape=(dp, sp)`` with ``axis_names=("dp", "sp")`` for data-parallel
    batched training on top of node sharding.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != #devices {len(devices)}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Bring up the multi-host JAX runtime (idempotent).

    On TPU pods with standard env (TPU_WORKER_HOSTNAMES etc.) all args are
    auto-detected — call with no arguments.  For manual clusters (the
    2-process CPU test, GKE without metadata) pass coordinator/world
    explicitly.  After this, ``jax.devices()`` is GLOBAL across hosts and
    ``make_global_mesh`` can lay dp over DCN x sp over ICI.
    """
    # NB: must not touch jax.devices()/process_count() here — any backend
    # query before jax.distributed.initialize() is an error.
    from jax._src.distributed import global_state

    if global_state.client is not None:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def make_global_mesh(
    dp: Optional[int] = None,
    axis_names: Sequence[str] = ("dp", "sp"),
) -> Mesh:
    """DCN x ICI mesh over ALL processes' devices: ``dp`` groups span the
    process (host) boundary — defaults to one dp group per process — and
    ``sp`` shards nodes inside each group, so the per-layer SpMM exchange
    and attention psum ride ICI while only gradient all-reduces cross DCN
    (docs/MULTIHOST.md layout).  Devices are ordered process-major, which
    is exactly ``jax.devices()`` order."""
    devs = jax.devices()
    dp = dp if dp is not None else jax.process_count()
    if len(devs) % dp:
        raise ValueError(f"{len(devs)} devices not divisible by dp={dp}")
    if len(axis_names) == 1:
        if dp != len(devs):
            raise ValueError(
                f"1-axis mesh needs dp == #devices, got {dp} != {len(devs)}"
            )
        return make_mesh((len(devs),), axis_names, devices=devs)
    return make_mesh((dp, len(devs) // dp), axis_names, devices=devs)


def feed_process_local(global_rows: int, local_data, mesh: Mesh, axis: str):
    """Per-host input feeding: build a GLOBAL row-sharded array from this
    process's local rows (``jax.make_array_from_process_local_data``) —
    each host materializes only its own shard of x / labels / masks.
    ``local_data``: the rows this process owns, in mesh-order."""
    sharding = NamedSharding(
        mesh, P(axis, *([None] * (np.ndim(local_data) - 1)))
    )
    global_shape = (global_rows,) + tuple(np.shape(local_data)[1:])
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_data), global_shape
    )
