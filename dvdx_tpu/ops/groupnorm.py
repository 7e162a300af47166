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

# Row-size ceiling for the pallas path, set by MEASUREMENT not VMEM: at the
# large level-0/1 rows XLA's GN (stats pass producer-fused into the previous
# conv) beats this kernel end-to-end (9.91 vs 9.53 s/video when applied
# everywhere — the sequential per-row grid and the VMEM re-read cost more
# than the saved HBM pass), while at deep-level rows ((180, 1280)-class) the
# kernel wins ~1.5x standalone. VMEM itself allows ~2.5 MB rows.
_VMEM_ROW_LIMIT = 512 * 1024
# f32 chunk temporaries are kept under this by static L-chunking
_F32_CHUNK_LIMIT = 2 * 1024 * 1024


def _pad128(c: int) -> int:
    return (c + 127) // 128 * 128


def _pick_chunks(l: int, c: int) -> Optional[int]:
    """Smallest chunk count whose f32 (Lc, Cpad) slice fits the budget;
    chunk boundaries must be 8-row aligned (sublane tiling). None = no valid
    split (caller falls back to XLA)."""
    for k in (1, 2, 4, 8, 16):
        if l % k:
            continue
        lc = l // k
        if k > 1 and lc % 8:
            continue
        if lc * _pad128(c) * 4 <= _F32_CHUNK_LIMIT:
            return k
    return None


def _masks(channels: int, groups: int):
    cpg = channels // groups
    m = np.zeros((channels, _G_PAD), np.float32)
    for c in range(channels):
        m[c, c // cpg] = 1.0
    return m, np.ascontiguousarray(m.T)


def _gn_kernel(x_ref, gamma_ref, beta_ref, bias_ref, mask_ref, maskt_ref,
               o_ref, *, n_per_group: int, eps: float, act: str,
               out_dtype, n_chunks: int):
    """Per-row one-pass GN. The bf16 row lives in VMEM once; f32 work is done
    in `n_chunks` statically-unrolled L-slices so the f32 temporaries stay
    chunk-sized — a full-row f32 materialisation blew the 16 MB scoped-vmem
    limit at the (2880, 320) level-0 rows (Mosaic stack OOM)."""
    l, c = x_ref.shape[1], x_ref.shape[2]
    lc = l // n_chunks
    bias = bias_ref[0].astype(jnp.float32)                # (1, C)
    mask = mask_ref[...]                                  # (C, Gp)
    maskt = maskt_ref[...]                                # (Gp, C)
    inv_n = 1.0 / n_per_group

    # pass 1 (VMEM-resident): one-pass moments, flax use_fast_variance math
    s = jnp.zeros((1, c), jnp.float32)
    s2 = jnp.zeros((1, c), jnp.float32)
    for i in range(n_chunks):                             # static slices
        xi = x_ref[0, i * lc:(i + 1) * lc, :].astype(jnp.float32) + bias
        s = s + jnp.sum(xi, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(xi * xi, axis=0, keepdims=True)
    mean_g = jax.lax.dot(s, mask) * inv_n                 # (1, Gp)
    var_g = jax.lax.dot(s2, mask) * inv_n - mean_g * mean_g
    mean_c = jax.lax.dot(mean_g, maskt)                   # (1, C)
    rstd_c = jax.lax.dot(jax.lax.rsqrt(var_g + eps), maskt)

    g = rstd_c * gamma_ref[...].astype(jnp.float32)       # (1, C)
    b = beta_ref[...].astype(jnp.float32) - mean_c * g
    # pass 2 (still the same VMEM-resident row): normalize + activate
    for i in range(n_chunks):
        xi = x_ref[0, i * lc:(i + 1) * lc, :].astype(jnp.float32) + bias
        y = xi * g + b
        if act == "silu":
            y = y * jax.nn.sigmoid(y)
        o_ref[0, i * lc:(i + 1) * lc, :] = y.astype(out_dtype)


# tests flip this to run the kernel through the pallas interpreter on CPU
_INTERPRET = False


@functools.partial(jax.jit, static_argnames=("groups", "eps", "act"))
def _gn_pallas(x3, gamma, beta, bias, *, groups: int, eps: float, act: str):
    from jax.experimental import pallas as pl

    n, l, c = x3.shape
    mask, maskt = _masks(c, groups)
    kern = functools.partial(
        _gn_kernel, n_per_group=l * (c // groups), eps=eps, act=act,
        out_dtype=x3.dtype, n_chunks=_pick_chunks(l, c))
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            # bias rides as (N, 1, C) so the per-row block (1, 1, C) meets
            # the Mosaic rule (last two dims must equal the array dims or
            # tile to (8, 128))
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, _G_PAD), lambda i: (0, 0)),
            pl.BlockSpec((_G_PAD, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, l, c), x3.dtype),
        interpret=_INTERPRET,
    )(x3, gamma.reshape(1, c), beta.reshape(1, c), bias.reshape(n, 1, c),
      mask, maskt)


def _gn_reference(x3, gamma, beta, bias, *, groups: int, eps: float, act: str):
    """jnp twin with flax.linen.GroupNorm math (fast-variance f32 moments,
    matching the kernel's one-pass form)."""
    n, l, c = x3.shape
    x = x3.astype(jnp.float32) + bias.astype(jnp.float32)[:, None, :]
    xg = x.reshape(n, l, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg), axis=(1, 3), keepdims=True) - mean * mean
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, l, c) * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    if act == "silu":
        y = jax.nn.silu(y)
    return y.astype(x3.dtype)


def wants_pallas(shape, groups: int) -> bool:
    """True when the pallas kernel is the measured winner for this fold:
    TPU backend + deep-level row sizes (see _VMEM_ROW_LIMIT note). Call-site
    branches use this so the fallback stays the EXACT nn.GroupNorm program
    (an f32-twin fallback lowered measurably worse at the hot shapes:
    9.91 vs 9.53 s/video end-to-end)."""
    c = shape[-1]
    l = int(np.prod(shape[1:-1]))
    return (jax.default_backend() == "tpu"
            and c % groups == 0
            and l * _pad128(c) * 2 <= _VMEM_ROW_LIMIT
            and _pick_chunks(l, c) is not None)


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

    fn = _gn_pallas if wants_pallas(shape, groups) else _gn_reference
    return fn(x3, gamma, beta, bias, groups=groups, eps=eps,
              act=act).reshape(shape)
