"""Test helpers.

Freshly-initialised models have zero-init output projections (temporal mixers,
spatial transformer proj_out, conv_out) — identity behaviour that golden tests
rely on, but which makes end-to-end signal-flow tests vacuous. This helper
fills every all-zero parameter with small deterministic noise so information
actually flows through attention/temporal paths. Host-side numpy (eager XLA
dispatch is pathologically slow in this runtime).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def perturb_zero_params(params, seed: int = 0, scale: float = 0.02):
    """Replace every all-zero leaf with N(0, scale) noise (deterministic)."""
    leaves, treedef = jax.tree.flatten(params)
    out = []
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        if arr.size > 0 and not arr.any():
            rng = np.random.default_rng(seed * 100003 + i)
            out.append(jnp.asarray(rng.normal(0.0, scale, arr.shape).astype(arr.dtype)))
        else:
            out.append(leaf)
    return jax.tree.unflatten(treedef, out)
