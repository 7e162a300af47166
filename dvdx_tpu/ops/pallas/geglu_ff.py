"""Fused GEGLU feed-forward for TPU: y = (x·Wv + bv) ⊙ gelu(x·Wg + bg) · Wo + bo.

Why a kernel: the transformer FF inner tensor is 8x the model width (GEGLU
doubles the 4x mult), and XLA materialises it in HBM — at the flagship
geometry the level-0 intermediate is (92160, 2560) bf16 = 472 MB written by
proj_in and read back by the gate/proj_out fusion, ~1 GB of pure activation
traffic per FF call (trace: `convolution_add_fusion.61`, 2.25 ms at 262 GB/s,
docs/PERF_NOTES.md round-3 profile). This kernel keeps the inner tensor in
VMEM per (token, inner) tile: HBM traffic drops to read-x + write-y plus one
weight sweep per token block.

Schedule: grid (token blocks, inner blocks), inner innermost and sequential —
y = Σ_i (x·Wv_i + bv_i) ⊙ gelu(x·Wg_i + bg_i) · Wo_i accumulates in f32 VMEM
scratch across inner blocks (GEGLU is linear in the proj_out contraction, so
blocking the inner dim is exact). Inner blocks must divide the inner width
(a ragged inner tail would add unmasked garbage into the accumulator); token
tails may be ragged (garbage rows stay in their rows and the write masks
them). Deep UNet levels run inner = 5120 at width 1280 — full-weight
residency would need 40 MB of VMEM, hence the inner blocking.

All three matmuls accumulate f32 on the MXU; the inner value/gate are rounded
to bf16 between matmuls exactly where the XLA path materialised bf16, so the
kernel matches the unfused reference within bf16 rounding (tests). gelu is
the exact-erf variant (torch F.gelu default) with erf evaluated by the
Abramowitz–Stegun 7.1.26 polynomial (Mosaic has no erf primitive; |err| <=
1.5e-7, far under bf16 ulp).

The FF it replaces is diffusers FeedForward(activation_fn='geglu') — the hot
MLP of every spatial/temporal transformer block in the reference's UNet3D
(`/root/reference/InferNet/neurons/miner.py:571-589` via diffusers).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x: jax.Array) -> jax.Array:
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x: jax.Array) -> jax.Array:
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _geglu_kernel(x_ref, wv_ref, bv_ref, wg_ref, bg_ref, wo_ref, bo_ref,
                  o_ref, acc_ref):
    ii = pl.program_id(1)
    n_i = pl.num_programs(1)

    @pl.when(ii == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]  # (bt, C) compute dtype
    v = jax.lax.dot_general(x, wv_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    v = v + bv_ref[...].astype(jnp.float32)
    g = jax.lax.dot_general(x, wg_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = g + bg_ref[...].astype(jnp.float32)
    # round to the storage dtype at the point the unfused path materialised
    # the inner tensor, then gate in f32 — matches XLA within bf16 ulp
    v = v.astype(x.dtype).astype(jnp.float32)
    g = g.astype(x.dtype).astype(jnp.float32)
    h = (v * _gelu_exact(g)).astype(x.dtype)
    acc_ref[...] += jax.lax.dot_general(h, wo_ref[...], (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    @pl.when(ii == n_i - 1)
    def _done():
        o = acc_ref[...] + bo_ref[...].astype(jnp.float32)
        o_ref[...] = o.astype(o_ref.dtype)


def _inner_block(inner: int, c: int) -> int:
    """Largest multiple-of-128 divisor of `inner` keeping the three
    double-buffered weight tiles (~12*c*bi bytes) around 9 MB."""
    budget = max(128, (9 * 2**20) // (12 * c))
    for bi in range(min(inner, budget) - min(inner, budget) % 128, 127, -128):
        if inner % bi == 0:
            return bi
    return inner  # no divisor found: single block (small inner widths)


def geglu_ff(x: jax.Array, w_in: jax.Array, b_in: jax.Array,
             w_out: jax.Array, b_out: jax.Array, *,
             block_t: int | None = None, block_i: int | None = None,
             interpret: bool = False) -> jax.Array:
    """Fused GEGLU MLP over the last axis.

    x: (..., C); w_in: (C, 2*I) with diffusers chunk order (value half,
    gate half); b_in: (2*I,); w_out: (I, C); b_out: (C,). Returns (..., C)
    in x.dtype. Weights are cast to x.dtype (what nn.Dense(dtype=...) does).
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    inner = w_in.shape[1] // 2
    xt = x.reshape(-1, c)
    t = xt.shape[0]

    dt = x.dtype
    wv = w_in[:, :inner].astype(dt)
    wg = w_in[:, inner:].astype(dt)
    bv = b_in[:inner].astype(dt).reshape(1, inner)
    bg = b_in[inner:].astype(dt).reshape(1, inner)
    wo = w_out.astype(dt)
    bo = b_out.astype(dt).reshape(1, c)

    # token block scaled to the width: x/out/acc cost ~12*bt*c bytes
    bt = block_t or min(512, max(128, ((3 * 2**20) // (12 * c)) // 8 * 8))
    bt = min(bt, t + (-t) % 8)
    bi = block_i or _inner_block(inner, c)
    grid = (pl.cdiv(t, bt), inner // bi)
    # forced-pallas runs on CPU (tests, parity checks) go through the
    # interpreter — same code path decisions, reference semantics
    interpret = interpret or jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _geglu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, c), lambda it, ii: (it, 0)),
            pl.BlockSpec((c, bi), lambda it, ii: (0, ii)),
            pl.BlockSpec((1, bi), lambda it, ii: (0, ii)),
            pl.BlockSpec((c, bi), lambda it, ii: (0, ii)),
            pl.BlockSpec((1, bi), lambda it, ii: (0, ii)),
            pl.BlockSpec((bi, c), lambda it, ii: (ii, 0)),
            pl.BlockSpec((1, c), lambda it, ii: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, c), lambda it, ii: (it, 0)),
        out_shape=jax.ShapeDtypeStruct((t, c), dt),
        scratch_shapes=[pltpu.VMEM((bt, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xt, wv, bv, wg, bg, wo, bo)
    return out.reshape(orig_shape)


def geglu_ff_reference(x, w_in, b_in, w_out, b_out):
    """Unfused math (the nn.Dense path of layers.GEGLUFeedForward), for
    equivalence tests."""
    dt = x.dtype
    hg = jnp.dot(x, w_in.astype(dt)) + b_in.astype(dt)
    h, gate = jnp.split(hg, 2, axis=-1)
    h = h * jax.nn.gelu(gate, approximate=False)
    return jnp.dot(h, w_out.astype(dt)) + b_out.astype(dt)
