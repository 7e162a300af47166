"""Fused flash attention (non-causal, self-attention) for TPU.

The UNet3D's spatial self-attention is the FLOP-dominant op of the denoise hot
loop (reference loop `/root/reference/InferNet/neurons/miner.py:571-589`; at
576x320 the per-frame token count is 72*40 = 2880). This kernel computes
softmax(QK^T * scale) V blockwise with the online-softmax recurrence so the
(S x S) logits matrix never hits HBM — the standard flash schedule, laid out
for the MXU: all matmuls f32-accumulated, block shapes multiples of (16, 128)
bf16 tiles.

Grid: (batch*heads, q_blocks[, k_blocks]); the k dimension is innermost and
sequential on TPU, so running max/denominator/accumulator live in VMEM scratch
across k iterations and the output is finalised on the last k block.

Round-3: auto block sizes prefer multiple-of-8 divisors of S (S=2880 -> 576),
so the standard geometry runs pad-free — the HBM pad/unpad-slice ops vanish
and the pad mask compiles out (the padded 3072 path cost ~11 ms/step of
pads+slices, docs/PERF_NOTES.md round-3 profile). Non-divisible sequence
lengths still zero-pad and mask the key tail.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pad_bias_row(seq_len: int, s_pad: int):
    """(1, s_pad) f32 additive mask row: 0 for real keys, -inf for padding.
    Computed at trace time from static shapes, so it folds to a constant."""
    col = jnp.arange(s_pad, dtype=jnp.int32)[None, :]
    return jnp.where(col < seq_len, 0.0, NEG_INF).astype(jnp.float32)


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr,
                  acc_scr, *, scale: float, masked: bool):
    i_k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(i_k == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # fold the softmax scale into q: one (Bq, D) multiply instead of a
    # (Bq, Bk) one on the logits — 16x less VPU work at D=64, Bk=1024
    q = q_ref[0].astype(jnp.float32) * scale  # (Bq, D)
    k = k_ref[0]  # (Bk, D)
    v = v_ref[0]  # (Bk, D)

    s = jax.lax.dot_general(
        q.astype(k.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Bq, Bk) f32

    if masked:
        # mask padded key columns with a precomputed additive bias row
        # (0 / -inf): ONE broadcast-add instead of the iota+add+compare+
        # select chain (4 full-size VPU passes per block). Compiled out
        # entirely when S divides the block size.
        s = s + bias_ref[0:1, :]

    m_prev = m_scr[:, 0:1]                      # (Bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)   # (Bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)             # (Bq, 1)
    p = jnp.exp(s - m_new)                      # (Bq, Bk) f32

    l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:, 0:1] = m_new
    l_scr[:, 0:1] = l_new

    @pl.when(i_k == n_k - 1)
    def _done():
        o_ref[0] = (acc_scr[:] / l_scr[:, 0:1]).astype(o_ref.dtype)


def _flash_bh(q, k, v, scale: float, seq_len: int, block_q: int, block_k: int,
              interpret: bool = False):
    """q,k,v: (BH, S_pad, D) -> (BH, S_pad, D)."""
    bh, s_pad, d = q.shape
    n_q = s_pad // block_q
    n_k = s_pad // block_k
    kernel = functools.partial(_flash_kernel, scale=scale,
                               masked=seq_len < s_pad)
    grid = (bh, n_q, n_k)
    bias = _pad_bias_row(seq_len, s_pad)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k), lambda b, iq, ik: (0, ik)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v, bias)


def _onepass_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                    masked: bool):
    """Single-pass attention for sequences whose full K/V fit in VMEM
    (S_pad <= ~4k at D=64): one masked softmax over the whole row, two large
    MXU matmuls, no online-softmax recurrence. ~3x fewer grid steps than the
    blocked path at UNet spatial sizes."""
    q = q_ref[0].astype(jnp.float32) * scale  # (Bq, D); scale folded into q
    k = k_ref[0]  # (S_pad, D)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q.astype(k.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Bq, S_pad) f32 in VMEM
    if masked:
        s = s + bias_ref[:]  # additive 0/-inf pad-mask row (see _flash_kernel)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _onepass_bh(q, k, v, scale: float, seq_len: int, block_q: int,
                interpret: bool = False):
    bh, s_pad, d = q.shape
    n_q = s_pad // block_q
    kernel = functools.partial(_onepass_kernel, scale=scale,
                               masked=seq_len < s_pad)
    bias = _pad_bias_row(seq_len, s_pad)
    return pl.pallas_call(
        kernel,
        grid=(bh, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq: (b, iq, 0)),
            pl.BlockSpec((1, s_pad, d), lambda b, iq: (b, 0, 0)),
            pl.BlockSpec((1, s_pad, d), lambda b, iq: (b, 0, 0)),
            pl.BlockSpec((1, s_pad), lambda b, iq: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v, bias)


# max padded seq len for the single-pass path: logits block (block_q x S_pad)
# f32 + K/V residency must fit VMEM
_ONEPASS_MAX_SEQ = 4096
# VMEM budget for the one-pass logits block (block_q x S_pad f32); beyond it
# auto-dispatch falls back to the blocked recurrence even when S_pad is short
_ONEPASS_LOGITS_BYTES = 8 * 2**20


def _gcd(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return a


def _divisor_block(s: int, hi: int, logits_budget: int | None) -> int | None:
    """Largest multiple-of-8 block <= hi that divides s (=> zero padding, the
    pad mask compiles out); None if s has no usable divisor >= 128. The
    one-pass schedule additionally bounds its (block, s) f32 logits tile."""
    start = min(hi, s)
    for bq in range(start - start % 8, 127, -8):
        if s % bq == 0 and (logits_budget is None
                            or bq * s * 4 <= logits_budget):
            return bq
    return None


def flash_attention(q, k, v, *, scale: float | None = None,
                    block_q: int | None = None, block_k: int | None = None,
                    onepass: bool | None = None,
                    interpret: bool = False):
    """Self-attention over (B, S, H, D) — drop-in for the XLA path in
    ops.attention. Auto block sizes prefer divisors of S (zero padding);
    otherwise S pads to a block multiple and the key tail is masked.

    onepass=None auto-selects the single-pass kernel when S_pad fits the
    VMEM residency bound; True/False forces the choice. Default blocks:
    512-class for the one-pass kernel (logits block_q x S_pad f32 must fit
    VMEM), 1024x1024 for the blocked recurrence (measured 2.7 -> 31.7 TFLOPS
    vs 512x512 at the XL spatial shape S=9216, BH=120 — benchmarks/attn_xl_ab)."""
    b, s, h, d = q.shape
    if scale is None:
        scale = d**-0.5
    if onepass is None:
        # decide with the block size the caller asked for (512-class
        # default): one-pass needs short-enough S AND its logits block within
        # VMEM — explicitly requested large blocks therefore force the
        # blocked path instead of being silently ignored
        bq = min(block_q or 512, max(128, 1 << (s - 1).bit_length()))
        s_probe = s + ((-s) % bq)
        onepass = (s_probe <= _ONEPASS_MAX_SEQ
                   and bq * s_probe * 4 <= _ONEPASS_LOGITS_BYTES)
    if block_q is None:
        if onepass:
            block_q = (_divisor_block(s, 1024, _ONEPASS_LOGITS_BYTES)
                       or min(512, max(128, 1 << (s - 1).bit_length())))
        else:
            block_q = _divisor_block(s, 1024, None) or 1024
    if block_k is None:
        block_k = block_q
    block_q = min(block_q, max(128, 1 << (s - 1).bit_length()))
    block_k = min(block_k, block_q)

    # S_pad must be a multiple of block_q (and of block_k when blocked):
    # pad to the lcm — zero when the blocks divide S
    mult = block_q if onepass else block_q * block_k // _gcd(block_q, block_k)
    pad = (-s) % mult
    s_pad = s + pad

    def to_bh(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    if onepass:
        o = _onepass_bh(to_bh(q), to_bh(k), to_bh(v), float(scale), s,
                        block_q, interpret=interpret)
    else:
        o = _flash_bh(to_bh(q), to_bh(k), to_bh(v), float(scale), s, block_q,
                      block_k, interpret=interpret)
    o = o[:, :s].reshape(b, h, s, d)
    return jnp.transpose(o, (0, 2, 1, 3))
