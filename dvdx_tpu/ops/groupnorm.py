"""One-pass fused GroupNorm(+bias)(+SiLU) pallas kernel.

Motivation (docs/PERF_NOTES.md, VERDICT r2 item 2): the UNet step is
activation-HBM-bound; GroupNorm statistics passes are ~17% of device time and
XLA executes each spatial GN as 2 reads + 1 write of the activation (stats
pass, then apply pass). For the per-frame folds the whole normalization row —
(H*W, C), 0.1–1.9 MB bf16 at the flagship levels — fits VMEM, so a pallas
kernel can read the row ONCE, compute the statistics in VMEM, and write the
normalized+activated output: 1R + 1W, and the preceding time-embedding bias
add plus the following SiLU ride along for free.

Semantics are diffusers GroupNorm (reference ResnetBlock2D/Transformer2D,
`/root/reference/InferNet/neurons/miner.py` model blocks): per sample,
channels split into `groups`, statistics over (spatial x channels-in-group),
f32 math, eps inside rsqrt. Statistics use the same two-pass form as
flax.linen.GroupNorm (mean, then E[(x-mean)^2]) — both passes run from VMEM.

Group reduction/broadcast-back are expressed as (C, G) / (G, C) one-hot mask
matmuls — MXU-friendly, no lane-dim reshapes (Mosaic restriction).

Only the TPU backend runs the pallas path; other backends use an equivalent
jnp implementation (exact flax math), so CPU tests and golden values are
unchanged. Miner and validator share one platform per the PoI platform pin,
so program identity is preserved.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# pad the group axis to one full lane tile; padded lanes hold zeros and are
# annihilated by the zero mask columns on the way back
_G_PAD = 128

# rows larger than this (f32 bytes, x + centered copy + output) fall back to
# the XLA path rather than risk VMEM exhaustion
_VMEM_ROW_LIMIT = 4 * 1024 * 1024


def _masks(channels: int, groups: int):
    cpg = channels // groups
    m = np.zeros((channels, _G_PAD), np.float32)
    for c in range(channels):
        m[c, c // cpg] = 1.0
    return m, np.ascontiguousarray(m.T)


def _gn_kernel(x_ref, gamma_ref, beta_ref, bias_ref, mask_ref, maskt_ref,
               o_ref, *, n_per_group: int, eps: float, act: str,
               out_dtype):
    x = x_ref[0].astype(jnp.float32)                      # (L, C)
    x = x + bias_ref[...].astype(jnp.float32)             # (1, C) bias row
    mask = mask_ref[...]                                  # (C, Gp)
    maskt = maskt_ref[...]                                # (Gp, C)
    inv_n = 1.0 / n_per_group

    s = jnp.sum(x, axis=0, keepdims=True)                 # (1, C)
    mean_g = jax.lax.dot(s, mask) * inv_n                 # (1, Gp)
    mean_c = jax.lax.dot(mean_g, maskt)                   # (1, C)
    xc = x - mean_c
    ss = jnp.sum(xc * xc, axis=0, keepdims=True)          # (1, C)
    var_g = jax.lax.dot(ss, mask) * inv_n                 # (1, Gp)
    rstd_c = jax.lax.dot(jax.lax.rsqrt(var_g + eps), maskt)

    y = xc * rstd_c * gamma_ref[...].astype(jnp.float32) \
        + beta_ref[...].astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(out_dtype)


# tests flip this to run the kernel through the pallas interpreter on CPU
_INTERPRET = False


@functools.partial(jax.jit, static_argnames=("groups", "eps", "act"))
def _gn_pallas(x3, gamma, beta, bias, *, groups: int, eps: float, act: str):
    from jax.experimental import pallas as pl

    n, l, c = x3.shape
    mask, maskt = _masks(c, groups)
    kern = functools.partial(
        _gn_kernel, n_per_group=l * (c // groups), eps=eps, act=act,
        out_dtype=x3.dtype)
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (i, 0)),
            pl.BlockSpec((c, _G_PAD), lambda i: (0, 0)),
            pl.BlockSpec((_G_PAD, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, l, c), x3.dtype),
        interpret=_INTERPRET,
    )(x3, gamma.reshape(1, c), beta.reshape(1, c), bias, mask, maskt)


def _gn_reference(x3, gamma, beta, bias, *, groups: int, eps: float, act: str):
    """jnp twin with flax.linen.GroupNorm math (two-pass f32 statistics)."""
    n, l, c = x3.shape
    x = x3.astype(jnp.float32) + bias.astype(jnp.float32)[:, None, :]
    xg = x.reshape(n, l, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, l, c) * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    if act == "silu":
        y = jax.nn.silu(y)
    return y.astype(x3.dtype)


def group_norm_act(x: jax.Array, gamma: jax.Array, beta: jax.Array, *,
                   groups: int, eps: float, act: str = "none",
                   bias: Optional[jax.Array] = None) -> jax.Array:
    """Fused GroupNorm over the non-leading axes of x (+ optional per-sample
    channel bias added BEFORE normalization, e.g. the resnet time embedding)
    (+ optional SiLU). x: (N, ..., C) with statistics over everything but N;
    bias: (N, C) or None."""
    shape = x.shape
    n, c = shape[0], shape[-1]
    l = int(np.prod(shape[1:-1]))
    x3 = x.reshape(n, l, c)
    if bias is None:
        bias = jnp.zeros((n, c), x.dtype)

    use_pallas = (
        jax.default_backend() == "tpu"
        and c % groups == 0
        and l * c * 4 <= _VMEM_ROW_LIMIT
    )
    fn = _gn_pallas if use_pallas else _gn_reference
    return fn(x3, gamma, beta, bias, groups=groups, eps=eps,
              act=act).reshape(shape)
