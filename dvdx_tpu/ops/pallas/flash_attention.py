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
import os as _os

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


# ---------------------------------------------------------------------------
# Multi-head-NATIVE schedule: consumes the projections' (B, S, H*dp) layout
# directly, so the (B,S,H,D)->(B*H,S,D) head-major transposes the classic
# schedule forces — 4 materialised HBM copies per attention call, ~9 ms/step
# at the standard geometry and ~35 ms/step at XL (fusion_attrib round-4 tail
# dump) — never exist. Heads are strips of dp = roundup128(head_dim) lanes;
# for head_dim < 128 the strips are zero-padded AT THE WEIGHT (columns of
# to_q/to_k/to_v, rows of to_out — pad_head_columns/pad_head_rows), which is
# free at runtime and keeps every in-kernel head slice 128-lane-aligned
# (Mosaic cannot slice lanes at unaligned offsets without a relayout).
# Zero-padded lanes are exact: they add 0-terms to the QK contraction and
# produce zero output lanes through PV. The MXU cost of contracting dp=128
# instead of d=64 is nil — a <=128-deep contraction occupies the systolic
# array for the same time (the D=64 ceiling, docs/PERF_NOTES.md), and the
# per-head loop lives INSIDE the grid step, so the grid shrinks ~H-fold
# (fewer, fatter steps; less per-op scheduling overhead).
# ---------------------------------------------------------------------------


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pad_head_columns(w: jax.Array, heads: int, head_dim: int) -> jax.Array:
    """(C, heads*head_dim) -> (C, heads*dp): zero-widen each head's column
    strip to the 128-lane tile. Applied to the projection WEIGHT so the
    matmul emits the padded layout directly — no activation-side pad op."""
    c = w.shape[0]
    dp = _ceil_to(head_dim, 128)
    if dp == head_dim:
        return w
    w3 = w.reshape(c, heads, head_dim)
    return jnp.pad(w3, ((0, 0), (0, 0), (0, dp - head_dim))).reshape(
        c, heads * dp)


def pad_head_rows(w: jax.Array, heads: int, head_dim: int) -> jax.Array:
    """(heads*head_dim, C) -> (heads*dp, C): zero rows aligned with the
    padded output lanes (which are exactly zero, so any rows would do)."""
    c = w.shape[1]
    dp = _ceil_to(head_dim, 128)
    if dp == head_dim:
        return w
    w3 = w.reshape(heads, head_dim, c)
    return jnp.pad(w3, ((0, 0), (0, dp - head_dim), (0, 0))).reshape(
        heads * dp, c)


def _onepass_mh_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, s_scr, *,
                       scale: float, masked: bool, heads: int, dp: int):
    """All heads of one q block against the full (VMEM-resident) K/V. The
    f32 logits live in ONE explicit scratch reused across the unrolled head
    loop — per-head jnp temporaries would otherwise be live simultaneously
    (heads x (Bq, T_pad) f32 blew the 16 MB scoped-vmem limit)."""
    for h in range(heads):
        sl = slice(h * dp, (h + 1) * dp)
        qh = q_ref[0, :, sl].astype(jnp.float32) * scale   # (Bq, dp)
        kh = k_ref[0, :, sl]                               # (T_pad, dp)
        s_scr[:] = jax.lax.dot_general(
            qh.astype(kh.dtype), kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (Bq, T_pad)
        if masked:
            s_scr[:] = s_scr[:] + bias_ref[0:1, :]
        m = jnp.max(s_scr[:], axis=1, keepdims=True)
        s_scr[:] = jnp.exp(s_scr[:] - m)
        l = jnp.sum(s_scr[:], axis=1, keepdims=True)
        o = jax.lax.dot_general(
            s_scr[:].astype(kh.dtype), v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


def _flash_mh_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr,
                     acc_scr, s_scr, *, scale: float, masked: bool,
                     heads: int, dp: int):
    """Blocked online-softmax recurrence, all heads per grid step. Running
    max/denominator live in per-head 128-lane strips of the scratch. With
    s_scr=None the logits are pure dataflow values (Mosaic pipelines the
    head iterations but keeps several live f32 tiles); with an explicit
    s_scr the tiles reuse one buffer (less VMEM, serialized heads)."""
    i_k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(i_k == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    for h in range(heads):
        sl = slice(h * dp, (h + 1) * dp)
        qh = q_ref[0, :, sl].astype(jnp.float32) * scale
        kh = k_ref[0, :, sl]
        s = jax.lax.dot_general(
            qh.astype(kh.dtype), kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (Bq, Bk)
        if masked:
            s = s + bias_ref[0:1, :]
        if s_scr is not None:
            s_scr[:] = s
            s = s_scr[:]
        m_prev = m_scr[:, h * dp:h * dp + 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        if s_scr is not None:
            s_scr[:] = jnp.exp(s_scr[:] - m_new)
            p = s_scr[:]
        else:
            p = jnp.exp(s - m_new)
        l_scr[:, h * dp:h * dp + 1] = (l_scr[:, h * dp:h * dp + 1] * alpha
                                       + jnp.sum(p, axis=1, keepdims=True))
        acc_scr[:, sl] = acc_scr[:, sl] * alpha + jax.lax.dot_general(
            p.astype(kh.dtype), v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:, h * dp:h * dp + 1] = m_new

    @pl.when(i_k == n_k - 1)
    def _done():
        for h in range(heads):
            sl = slice(h * dp, (h + 1) * dp)
            o_ref[0, :, sl] = (acc_scr[:, sl]
                               / l_scr[:, h * dp:h * dp + 1]).astype(
                                   o_ref.dtype)


# VMEM budget for the mh schedules (16 MB scoped vmem minus headroom).
# Working-set models include a 2x factor on the logits scratch: the
# read-modify-write chains through s_scr still keep ~one extra live
# temporary of its size.
_MH_VMEM_BUDGET = 12 * 2**20


def _pick_bq_onepass_mh(s: int, t_pad: int, hdp: int, itemsize: int):
    """Largest multiple-of-8 divisor of s whose onepass working set (resident
    K/V + double-buffered q/o blocks + logits scratch) fits the budget;
    None if even 128 does not fit."""
    kv = 2 * t_pad * hdp * itemsize
    for bq in range(min(1024, s) - min(1024, s) % 8, 127, -8):
        if s % bq:
            continue
        work = kv + 4 * bq * hdp * itemsize + 2 * bq * t_pad * 4
        if work <= _MH_VMEM_BUDGET:
            return bq
    return None


def _pick_blocks_flash_mh(s: int, t: int, hdp: int, itemsize: int):
    """(bq, bk) divisors of (s, t) fitting the blocked working set
    (double-buffered q/k/v blocks, f32 m/l/acc strips, logits scratch)."""
    for bq_hi, bk_hi in ((512, 1024), (512, 512), (256, 512), (256, 256),
                        (128, 256), (128, 128)):
        bq = _divisor_block(s, bq_hi, None)
        bk = _divisor_block(t, bk_hi, None)
        if bq is None or bk is None:
            continue
        work = (4 * bq * hdp * itemsize + 8 * bk * hdp * itemsize
                + 3 * bq * hdp * 4 + 2 * bq * bk * 4)
        if work <= _MH_VMEM_BUDGET:
            return bq, bk
    return None, None


def flash_attention_mh(q, k, v, *, heads: int, head_dim: int,
                       scale: float | None = None,
                       block_q: int | None = None,
                       block_k: int | None = None,
                       onepass: bool | None = None,
                       interpret: bool = False):
    """Attention in the projections' native head-strip layout.

    q: (B, Sq, heads*dp); k, v: (B, Sk, heads*dp) with dp =
    roundup128(head_dim) and zero pad lanes (see pad_head_columns).
    Returns (B, Sq, heads*dp) with zero pad lanes. Sq must have a
    multiple-of-8 divisor >= 128 (callers gate via wants_native_mh);
    Sk is zero-padded here and masked when not block-divisible.
    """
    b, s, hdp = q.shape
    dp = hdp // heads
    if scale is None:
        scale = head_dim**-0.5
    t = k.shape[1]
    itemsize = q.dtype.itemsize
    # forced-pallas runs off-TPU (tests, parity checks) use the interpreter
    interpret = interpret or jax.default_backend() != "tpu"

    if onepass is None:
        # one-pass whenever the resident K/V + logits scratch fit VMEM
        # (fewer grid steps, no recurrence); blocked otherwise
        t_probe = _ceil_to(t, 8)
        onepass = (t_probe <= _ONEPASS_MAX_SEQ
                   and _pick_bq_onepass_mh(s, t_probe, hdp, itemsize)
                   is not None)

    if onepass:
        t_pad = _ceil_to(t, 8)
        bq = block_q or _pick_bq_onepass_mh(s, t_pad, hdp, itemsize)
        if t_pad != t:
            k = jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0)))
        kernel = functools.partial(_onepass_mh_kernel, scale=float(scale),
                                   masked=t < t_pad, heads=heads, dp=dp)
        bias = _pad_bias_row(t, t_pad)
        return pl.pallas_call(
            kernel,
            grid=(b, s // bq),
            in_specs=[
                pl.BlockSpec((1, bq, hdp), lambda ib, iq: (ib, iq, 0)),
                pl.BlockSpec((1, t_pad, hdp), lambda ib, iq: (ib, 0, 0)),
                pl.BlockSpec((1, t_pad, hdp), lambda ib, iq: (ib, 0, 0)),
                pl.BlockSpec((1, t_pad), lambda ib, iq: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, hdp), lambda ib, iq: (ib, iq, 0)),
            out_shape=jax.ShapeDtypeStruct((b, s, hdp), q.dtype),
            scratch_shapes=[pltpu.VMEM((bq, t_pad), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(q, k, v, bias)

    bq, bk = block_q, block_k
    if bq is None or bk is None:
        bq, bk = _pick_blocks_flash_mh(s, t, hdp, itemsize)
    t_pad = _ceil_to(t, bk)
    masked = t < t_pad
    if masked and bk % 128:
        # the per-ik bias block must satisfy Mosaic's lane tiling; only the
        # masked (non-divisible) case reads it, so round bk up to 128s there
        bk = _ceil_to(bk, 128)
        t_pad = _ceil_to(t, bk)
    if t_pad != t:
        k = jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0)))
    # pure-dataflow logits (pipelinable) when ~heads live f32 tiles fit the
    # budget alongside the blocks; one reused scratch otherwise
    work_nos = (4 * bq * hdp * itemsize + 8 * bk * hdp * itemsize
                + 3 * bq * hdp * 4 + (heads + 1) * bq * bk * 4)
    use_scratch = work_nos > _MH_VMEM_BUDGET
    if _os.environ.get("DVDX_MH_SCRATCH", ""):
        use_scratch = _os.environ["DVDX_MH_SCRATCH"] == "1"
    kernel = functools.partial(_flash_mh_kernel, scale=float(scale),
                               masked=masked, heads=heads, dp=dp)
    if not use_scratch:
        kernel = functools.partial(kernel, s_scr=None)
    if masked:
        bias = _pad_bias_row(t, t_pad)
        bias_spec = pl.BlockSpec((1, bk), lambda ib, iq, ik: (0, ik))
    else:
        bias = jnp.zeros((1, 128), jnp.float32)  # unread dummy
        bias_spec = pl.BlockSpec((1, 128), lambda ib, iq, ik: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(b, s // bq, t_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bq, hdp), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, bk, hdp), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, bk, hdp), lambda ib, iq, ik: (ib, ik, 0)),
            bias_spec,
        ],
        out_specs=pl.BlockSpec((1, bq, hdp), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, hdp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, heads * dp), jnp.float32),
            pltpu.VMEM((bq, heads * dp), jnp.float32),
            pltpu.VMEM((bq, heads * dp), jnp.float32),
        ] + ([pltpu.VMEM((bq, bk), jnp.float32)] if use_scratch else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v, bias)


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
