"""Host-side (numpy) parameter initialisation.

In this runtime, flax's un-jitted ``model.init`` eagerly dispatches hundreds of
tiny XLA ops (minutes for even a toy model), and a jitted init compiles a huge
threefry graph. Neither is acceptable for a serving framework that cold-starts
miners, so parameters are materialised on host with numpy and transferred once.

Rules (by parameter path, deterministic per (seed, path)):
* leaf named ``bias``                          -> zeros
* leaf named ``scale`` (Layer/GroupNorm)       -> ones
* any path component containing ``_zero``      -> zeros (marked zero-init layers)
* leaf named ``embedding`` / ``*_embedding`` / ``cls_token`` -> N(0, 0.02)
* other kernels                                -> N(0, 1/sqrt(fan_in)) (lecun)

Exactly mirrors what the flax initializers in models/layers.py produce in
distribution; bitwise determinism comes from sha256(seed‖path)-seeded
Generators, so every host derives identical weights — part of the
Proof-of-Inference determinism chain (weights are shared out-of-band; the
reference gets this from HF-downloaded checkpoints).
"""

from __future__ import annotations

import hashlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _leaf_array(path: str, sds, seed: int) -> np.ndarray:
    shape = tuple(sds.shape)
    dtype = np.dtype(sds.dtype)
    name = path.rsplit("/", 1)[-1]
    if "_zero" in path or name == "bias":
        return np.zeros(shape, dtype)
    if name == "scale":
        return np.ones(shape, dtype)
    rng = np.random.default_rng(
        int.from_bytes(hashlib.sha256(f"{seed}:{path}".encode()).digest()[:8], "big")
    )
    if "embedding" in name or name == "cls_token":
        return rng.normal(0.0, 0.02, size=shape).astype(dtype)
    # kernel-like: lecun normal over fan_in = prod(all dims but last)
    fan_in = max(1, int(np.prod(shape[:-1])))
    std = float(np.sqrt(1.0 / fan_in))
    return rng.normal(0.0, std, size=shape).astype(dtype)


def _paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _paths(v, f"{prefix}/{k}" if prefix else str(k))
    else:
        yield prefix, tree


def fast_init(model, seed: int, *args, **kwargs) -> Any:
    """Shape-trace the model, fill parameters on host. Returns the same pytree
    structure flax's model.init would."""
    shapes = jax.eval_shape(lambda *a, **kw: model.init(jax.random.key(0), *a, **kw),
                            *args, **kwargs)
    flat = dict(_paths(shapes))

    def build(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: build(v, f"{prefix}/{k}" if prefix else str(k)) for k, v in tree.items()}
        return jnp.asarray(_leaf_array(prefix, tree, seed))

    import flax.core

    unfrozen = flax.core.unfreeze(shapes) if hasattr(shapes, "unfreeze") else shapes
    return build(unfrozen)


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def param_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
