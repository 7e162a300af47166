"""Fused temporal transformer BLOCK: the whole _TemporalBlock (LN -> attn1,
LN -> attn2, LN -> GEGLU FF, all residual) as ONE pallas kernel on the native
frame-major (B, F, N, C) layout.

Why: the temporal-transformer stream is dominated by per-op overheads, not
math — at the standard geometry its level-0 ops cost 23 ms/step (LN stats
passes 7.6, token-minor conv-emitter projection matmuls at 31-43% MXU 9.4,
kernel launches, residual chains; fusion_attrib round-4 dump) while the
irreducible matmul+attention FLOPs are a few ms. Every weight of a C=320
block fits VMEM (~4.1 MB bf16: 8 attention projections + the GEGLU pair), so
one kernel can stream x through the ENTIRE block: x is read once from HBM
and written once, LN statistics never leave registers, the projections run
as resident-weight MXU matmuls, and the two attentions reuse the packed
checkerboard schedule of temporal_attention_fm (rows (f, w)-ordered — a free
view of the frame-major block).

Numerics match the unfused flax path within bf16 rounding: f32 LN moments
(flax use_fast_variance), f32 matmul accumulation with bf16 rounding where
nn.Dense materialises, the geglu_ff kernel's inner-rounding convention, and
exact-erf gelu (A&S 7.1.26). Capability parity: diffusers
TransformerTemporalModel's BasicTransformerBlock with double_self_attention
(`/root/reference/InferNet/neurons/miner.py:83-87` via diffusers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geglu_ff import _gelu_exact
from .temporal_attention import _checkerboard_bias, _packed_heads_attend

# resident-weight bound: 20*C^2 bf16 (8 attention projections + GEGLU pair)
# plus FF f32 temporaries must leave room for the x tiles
_MAX_DIM = 384
# static GEGLU inner-block width (exact accumulation over inner blocks, the
# geglu_ff schedule) — bounds the live f32 FF temporaries at (m, R, 256)
_FF_INNER_BLOCK = 256


def choose_blocking_block(frames: int, c: int, heads: int) -> tuple[int, int]:
    """(wsub, m) for the fused block kernel. wsub pins to the 8-row sublane
    granule (checkerboard packing, waste 8); m from a VMEM model: resident
    weights 40*C^2 bytes + per-tile live set: ~12 copies of the (R, C) bf16
    tile across the residual chain, the f32 FF accumulator (R, C), and ~4
    live (R, _FF_INNER_BLOCK) f32 FF temporaries. Returns (0, 0) when C
    exceeds the resident-weight bound or nothing fits."""
    if frames > 128 or c > _MAX_DIM:
        return 0, 0
    r = 8 * frames
    weights = 40 * c * c
    per_tile = r * (24 * c + 4 * c + 16 * _FF_INNER_BLOCK)
    m = min((9 * 2**20 - weights) // per_tile, 8)
    if m < 1:
        return 0, 0
    return 8, int(m)


def _ln(x, scale, bias, eps):
    """flax nn.LayerNorm math (f32 fast-variance moments) -> x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _mm(x, w):
    """(m, R, A) @ (A, B) -> (m, R, B), f32 accumulation, bf16-rounded like
    nn.Dense(dtype=...)."""
    o = jax.lax.dot_general(x, w, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return o.astype(x.dtype)


def _attn(xt, bias, wq, wk, wv, wo, bo, *, heads, d, scale):
    q = _mm(xt, wq[...])
    k = _mm(xt, wk[...])
    v = _mm(xt, wv[...])
    o = _packed_heads_attend(q, k, v, bias, xt.dtype, scale=scale,
                             heads=heads, d=d)
    return _mm(o, wo[...]) + bo[...].astype(xt.dtype)


def _block_kernel(x_ref, ln1s, ln1b, q1, k1, v1, o1w, o1b,
                  ln2s, ln2b, q2, k2, v2, o2w, o2b,
                  ln3s, ln3b, ffiw, ffib, ffow, ffob, bias_ref, o_ref, *,
                  scale: float, m: int, wsub: int, n_positions: int,
                  heads: int, d: int, inner: int, eps: float):
    f, bp, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]

    x = x_ref[0].reshape(f, m, wsub, c)
    x = jnp.swapaxes(x, 0, 1).reshape(m, f * wsub, c)   # (m, R, C), (f, w) rows
    if n_positions % bp:
        # zero out-of-range rows once: K/V of both attentions then carry
        # zeros (cross-position terms are checkerboard-masked anyway) and no
        # NaN can propagate; the out-of-range output rows are clipped on
        # write-back.
        g = jax.lax.broadcasted_iota(jnp.int32, (m, f * wsub, 1), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (m, f * wsub, 1), 1)
        pos = pl.program_id(1) * bp + g * wsub + j % wsub
        x = jnp.where(pos < n_positions, x, 0)

    bias = bias_ref[...][None, :, :]
    x = x + _attn(_ln(x, ln1s[...], ln1b[...], eps), bias,
                  q1, k1, v1, o1w, o1b, heads=heads, d=d, scale=scale)
    x = x + _attn(_ln(x, ln2s[...], ln2b[...], eps), bias,
                  q2, k2, v2, o2w, o2b, heads=heads, d=d, scale=scale)

    h = _ln(x, ln3s[...], ln3b[...], eps)
    # GEGLU FF with the inner dim statically blocked (exact: GEGLU is linear
    # in the proj_out contraction — the geglu_ff schedule): the live f32
    # temporaries are (m, R, bi)-sized instead of (R, 8C), which is what lets
    # m > 1 tiles fit (choose_blocking_block's VMEM model counts on it).
    n_i = inner // _FF_INNER_BLOCK if inner % _FF_INNER_BLOCK == 0 else 1
    bi = inner // n_i
    acc = jnp.zeros((m, f * wsub, c), jnp.float32)
    for i in range(n_i):
        vsl = slice(i * bi, (i + 1) * bi)
        gsl = slice(inner + i * bi, inner + (i + 1) * bi)
        val = jax.lax.dot_general(h, ffiw[:, vsl], (((2,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        val = val + ffib[0:1, vsl].astype(jnp.float32)
        gate = jax.lax.dot_general(h, ffiw[:, gsl], (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        gate = gate + ffib[0:1, gsl].astype(jnp.float32)
        # round to storage dtype where the unfused path materialises, gate
        # in f32 (the geglu_ff convention; matches XLA within bf16 ulp)
        val = val.astype(x.dtype).astype(jnp.float32)
        gate = gate.astype(x.dtype).astype(jnp.float32)
        hf = (val * _gelu_exact(gate)).astype(x.dtype)
        acc = acc + jax.lax.dot_general(hf, ffow[vsl, :],
                                        (((2,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    x = x + (acc + ffob[...].astype(jnp.float32)).astype(x.dtype)

    x = jnp.swapaxes(x.reshape(m, f, wsub, c), 0, 1)
    o_ref[0] = x.reshape(f, bp, c)


def fused_temporal_block(x: jax.Array, params: dict, *, heads: int,
                         scale: float | None = None, eps: float = 1e-5,
                         block_positions: int | None = None,
                         interpret: bool = False) -> jax.Array:
    """Run a full _TemporalBlock on x: (B, F, N, C) frame-major.

    params: flat dict with keys ln{1,2,3}_{s,b}; {q,k,v}{1,2}; o{1,2}_{w,b};
    ffi_{w,b}; ffo_{w,b} — exactly the flax module's arrays (f32; cast to
    x.dtype here, as nn.Dense/nn.LayerNorm(dtype=...) do)."""
    b, f, n, c = x.shape
    d = c // heads
    inner = params["ffi_w"].shape[1] // 2
    if scale is None:
        scale = d**-0.5
    wsub, m_auto = choose_blocking_block(f, c, heads)
    if wsub == 0:
        raise ValueError(f"no fused-block packing for F={f}, C={c}")
    if block_positions is not None:
        bp = block_positions
        m = bp // wsub
    else:
        m = max(1, min(m_auto, pl.cdiv(n, wsub)))
        bp = m * wsub
        for cand in range(bp, max(wsub, bp // 2) - 1, -wsub):
            if n % cand == 0:
                bp = cand
                m = bp // wsub
                break
    r = wsub * f
    dt = x.dtype

    def w(name):   # weights in compute dtype (what nn.Dense(dtype=..) does)
        return params[name].astype(dt)

    def vec(name, width):
        return params[name].reshape(1, width).astype(jnp.float32)

    operands = [
        x,
        vec("ln1_s", c), vec("ln1_b", c), w("q1"), w("k1"), w("v1"),
        w("o1_w"), vec("o1_b", c).astype(dt),
        vec("ln2_s", c), vec("ln2_b", c), w("q2"), w("k2"), w("v2"),
        w("o2_w"), vec("o2_b", c).astype(dt),
        vec("ln3_s", c), vec("ln3_b", c),
        w("ffi_w"), vec("ffi_b", 2 * inner), w("ffo_w"), vec("ffo_b", c),
        _checkerboard_bias(wsub, f),
    ]
    const = lambda ib, ip: (0, 0)  # noqa: E731

    def spec(arr):
        if arr.ndim == 2:
            return pl.BlockSpec(arr.shape, const)
        return pl.BlockSpec((1, f, bp, c), lambda ib, ip: (ib, 0, ip, 0))

    kernel = functools.partial(
        _block_kernel, scale=float(scale), m=m, wsub=wsub, n_positions=n,
        heads=heads, d=d, inner=inner, eps=eps)
    interpret = interpret or jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        grid=(b, pl.cdiv(n, bp)),
        in_specs=[spec(a) for a in operands],
        out_specs=pl.BlockSpec((1, f, bp, c), lambda ib, ip: (ib, 0, ip, 0)),
        out_shape=jax.ShapeDtypeStruct((b, f, n, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*operands)
