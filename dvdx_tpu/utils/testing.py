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


def amplify_temporal_params(params, gain: float):
    """Scale the temporal-mixer output leaves (zero-init at birth:
    ``temporal_attn/to_out_zero``, ``temp_conv/conv*_zero``) by ``gain``.

    A perturbed-zero model couples frames only at O(perturb scale), so its
    "video" is near-independent per-frame noise — chunk seams are invisible
    against an interior frame-pair L1 that is itself maximal. Trained video
    models are the opposite: temporal attention/convs dominate, frames are
    coherent, and chunk boundaries are where that coherence breaks (the
    reference's temp_instab measurement,
    /root/reference/Distribution/strategies/chunk_only.py:183-208).
    Amplifying exactly the temporal-mixer outputs moves the random parameter
    point toward that trained regime — same program, same architecture, just
    a parameter point where frame coupling is strong — so boundary metrics
    have signal at toy scale."""
    def match(ks):
        return ("temporal_attn" in ks or "temp_conv" in ks) and "zero" in ks

    return _amplify_matching(params, gain, match)


def amplify_output_params(params, gain: float):
    """Scale the UNet's zero-init output conv (``conv_out_zero``) by ``gain``.

    Companion to :func:`amplify_temporal_params`: temporal gain makes the
    eps prediction frame-COUPLED, but with conv_out at the perturbation
    scale eps stays negligible against the base noise, so the decoded video
    is per-frame noise regardless (measured: interior frame-pair L1 pinned
    at its 0.25 maximum). Output gain makes eps MATTER; together they put
    the random parameter point in the coherent-video regime where boundary
    metrics have signal (benchmarks/boundary_sweep.py, calibration table in
    its docstring)."""
    return _amplify_matching(params, gain, lambda ks: "conv_out_zero" in ks)


def _amplify_matching(params, gain: float, match):
    from jax.tree_util import keystr, tree_flatten_with_path

    leaves, treedef = tree_flatten_with_path(params)
    out = []
    for path, leaf in leaves:
        if match(keystr(path)):
            out.append(jnp.asarray(np.asarray(leaf) * gain))
        else:
            out.append(leaf)
    return jax.tree.unflatten(treedef, out)
