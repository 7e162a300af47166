"""Device mesh construction.

Axes:
  data  — batch / independent requests (DP)
  model — parameter sharding (the FSDP/ZeRO-3 analog via GSPMD; reference
          `strategies/fsdp.py:71-99` shards with torch FSDP FULL_SHARD)
  seq   — frame/chunk axis (the temporal-chunking / context-parallel analog;
          reference `chunk_only.py:115` round-robins chunks over ranks)

The reference picks a strategy by launching a different script under torchrun;
here the same jitted program runs on any (data, model, seq) mesh factorisation
and XLA inserts the collectives (ICI all-gather for params, nothing at all for
independent chunks).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "model", "seq")


def make_mesh(
    shape: Optional[Tuple[int, int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model, seq) mesh. shape=None uses all devices as
    (1, 1, n) — pure sequence/chunk parallelism, the reference's default
    deployment (replicated model, chunked frames)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (1, 1, n)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not use {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def single_device_mesh() -> Mesh:
    return make_mesh((1, 1, 1), devices=[jax.devices()[0]])
