"""Device mesh construction — the runtime layer replacing Lightning Fabric's
launcher/strategies (reference `pretrain/redpajama.py:112-131`, SURVEY.md §2.3).

Axes:
  * ``dp``   — pure data parallel (batch replication), rides DCN across slices.
  * ``fsdp`` — parameter/optimizer sharding (the ZeRO-1/2/3 + FSDP equivalents all
               collapse into this one sharding axis on TPU).
  * ``tp``   — tensor parallel over attention heads / MLP hidden, rides ICI.
  * ``pp``   — pipeline parallel over the stacked layer axis (only present when
               requested with ``pp > 1``; see `parallel/pipeline.py`).

For multi-host: call `jax.distributed.initialize()` before `make_mesh`; the mesh is
built over the global device list, so the same program runs 1-chip to multi-pod.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

AXES = ("dp", "fsdp", "tp")


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed when launched under a multi-host coordinator
    (JAX_COORDINATOR_ADDRESS or TPU pod env). Safe no-op on a single host."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        try:
            jax.distributed.initialize()
            return True
        except RuntimeError:
            pass  # already initialized
    return False


def make_mesh(
    dp: int = 1,
    fsdp: int = -1,
    tp: int = 1,
    pp: int = 1,
    ep: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('dp', 'fsdp', 'tp'[, 'pp'][, 'ep']) mesh; one axis may be -1
    (inferred).

    The 'pp'/'ep' axes are appended only when ``> 1`` so all other codepaths
    see the unchanged 3-axis mesh. Both are placed innermost: pipeline
    stage-boundary ppermutes are point-to-point and MoE dispatch all_to_alls
    are all-pairs — both benefit most from ICI adjacency (`parallel/ep.py`).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    dims = [dp, fsdp, tp] + ([pp] if pp > 1 else []) + ([ep] if ep > 1 else [])
    axes = AXES + (("pp",) if pp > 1 else ()) + (("ep",) if ep > 1 else ())
    if -1 in dims:
        known = int(np.prod([d for d in dims if d != -1]))
        assert n % known == 0, f"{n} devices not divisible by {known}"
        dims[dims.index(-1)] = n // known
    assert int(np.prod(dims)) == n, f"mesh {dims} != {n} devices"
    dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, axes)


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(*spec))
