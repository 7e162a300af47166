"""Fused temporal (frame-axis) attention for TPU: many tiny softmax-attentions
packed onto the MXU as one block-diagonal attention per 128-row tile.

The video UNet's temporal transformers attend over the FRAME axis (F = 16-24)
independently at every spatial position — per position the matmuls are
(F x D)@(D x F) = 16x64x16, which the MXU executes at ~1.5% utilisation, and
XLA additionally materialises the f32 logits (B, N, H, F, F) in HBM plus a
softmax chain of full-size VPU passes (trace: the `attn1/sub` ops alone cost
~22 ms/step, docs/PERF_NOTES.md round-3 profile; the reference hits the same
structure through diffusers TransformerTemporalModel,
`/root/reference/InferNet/neurons/miner.py:83-87`).

Packing: W = floor(128/F) positions share one (R, D) tile (R = W*F rows,
row = position-major). QK^T on the packed tile computes an (R, R) logits
block whose useful entries are the W diagonal (F, F) blocks; an additive
0/-inf block-diagonal bias masks the cross-position terms, softmax rows stay
per-position-exact, and P@V yields the packed outputs — correct because the
masked probabilities are exactly zero. W positions per MXU pass instead of 1,
logits never leave VMEM, and the (B, F, N, H*D) activation layout is consumed
natively (no HBM transposes). Heads are sliced inside the kernel (static
unroll): pallas TPU blocks must keep the full lane dimension, and head_dim
can be non-128 (transformer_in uses D=40).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def packing_width(frames: int) -> int:
    """Largest W with W*F <= 128 and W*F a multiple of 8 (sublane-aligned
    group slicing); 0 if no packing exists (F > 128)."""
    best = 0
    for w in range(1, 128 // frames + 1 if frames <= 128 else 1):
        if (w * frames) % 8 == 0 or w * frames == 128:
            best = w
    return best


def choose_blocking(frames: int, hd: int, heads: int) -> tuple[int, int]:
    """Pick (W, bp): packing width and positions-per-program.

    TPU block legality requires bp % 8 == 0 (the position axis is the block's
    sublane dimension), and group slicing requires bp % W == 0 — so bp must be
    a multiple of lcm(W, 8). The largest feasible W is not always usable: at
    F=24 the max packing W=5 forces bp into multiples of 40, which busts the
    per-head logits VMEM bound, while W=4 admits bp=24 (this is exactly the
    XL geometry; a W=5/bp=20 choice fails Mosaic lowering). Enumerate W
    descending, return the first with a legal bp; (0, 0) if none.

    VMEM bounds (measured, see temporal_attention): ~30 bytes/element of
    block residency caps bp*F*HD at ~10 MB, and the statically-unrolled
    heads' (gpp, R, R) f32 logits+probs temporaries cap gpp*R*R*8*heads at
    ~4 MB.
    """
    if frames > 128:
        return 0, 0
    budget = max(1, (10 * 2**20) // (frames * hd * 30))
    for w in range(128 // frames, 0, -1):
        if (w * frames) % 8 and w * frames != 128:
            continue
        r = w * frames
        head_gpp = (4 * 2**20) // (r * r * 8 * heads)
        gpp_max = min(16, budget // w, head_gpp)
        step = 8 // math.gcd(w, 8)  # gpp granularity making bp % 8 == 0
        gpp = (gpp_max // step) * step
        if gpp >= step:
            return w, gpp * w
    return 0, 0


def choose_blocking_posmajor(frames: int, hd: int, heads: int
                             ) -> tuple[int, int]:
    """Blocking for the position-major kernel (q/k/v in (B, N, F, HD)).

    With positions as an UNTILED leading block dim, the Mosaic constraints
    move: F is the sublane dim (needs F % 8 == 0), bp only needs bp % W == 0
    (the (bp, F, HD) -> (gpp, R, HD) regroup must split evenly), and W is
    simply floor(128/F) — the W=5 packing that was sublane-illegal in the
    frame-major layout at F=24 becomes usable (R=120).

    VMEM: Mosaic's scoped limit is 16 MB and the compiler reports the real
    stack demand, so the budget uses the MEASURED constant, not an op
    inventory: the first cut (gpp=16/24 at HD=320) was reported at 29.8/29.9
    MB on the stack, i.e. ~46 bytes per packed element W*F*HD per group
    (double-buffered io blocks, materialised regroup views, masked K/V
    copies, f32 logits+probs, unrolled head outputs). Budget 9 MB for
    headroom. Returns (W, bp), or (0, 0) when F is not sublane-aligned or
    no group fits.
    """
    if frames > 128 or frames % 8:
        return 0, 0
    w = 128 // frames
    per_group = w * frames * hd * 46
    gpp = min((9 * 2**20) // per_group, 32)
    if gpp < 1:
        return 0, 0
    return w, gpp * w


def choose_blocking_fm(frames: int, hd: int, heads: int) -> tuple[int, int]:
    """Blocking for the FRAME-MAJOR checkerboard kernel: (wsub, m).

    Each MXU tile packs wsub=8 positions x F frames with rows in (f, w)
    order — a FREE view of the frame-major block — and a checkerboard
    additive mask (0 iff same position) replaces the posmajor kernel's
    block-diagonal one. wsub is pinned to the 8-row sublane granule, so the
    logits waste factor is 8 (vs W=floor(128/F) posmajor — identical at
    F=16, 8/5 at F=24); in exchange the module needs NO position-major HBM
    relayout at all (those transposes measured 95-101 ms/step at XL,
    fusion_attrib round-4 dump) and F needs no 8-divisibility.

    m = tiles per grid step from the compiler-measured VMEM constant: the
    first cut (m=10 at F=16/HD=320) was reported at 16.12 MB on the stack,
    i.e. ~38 B per packed element (double-buffered io, regroup views, f32
    logits/probs with early casts), plus a flat live-logits term. Budget
    9 MB for headroom; wide shapes that only fit a single tile get m=1 up
    to a 14 MB ceiling. Returns (0, 0) if F > 128 or nothing fits."""
    if frames > 128:
        return 0, 0
    r = 8 * frames
    head_term = 3 * r * r * 4
    per_tile = 38 * 8 * frames * hd
    m = min((9 * 2**20 - head_term) // per_tile, 16)
    if m < 1:
        if head_term + per_tile <= 14 * 2**20:
            return 8, 1
        return 0, 0
    return 8, int(m)


def _checkerboard_bias(wsub: int, f: int) -> jax.Array:
    """(R, R) f32 additive mask for (f, w)-ordered packed rows: 0 where both
    rows belong to the same position (i % wsub == j % wsub), -inf across
    positions. Static -> folds to a constant."""
    r = wsub * f
    idx = jnp.arange(r, dtype=jnp.int32) % wsub
    return jnp.where(idx[:, None] == idx[None, :], 0.0, NEG_INF).astype(
        jnp.float32)


def _temporal_kernel_fm(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                        scale: float, m: int, wsub: int, n_positions: int,
                        heads: int, d: int):
    # refs: (1, F, bp, HD) FRAME-major, bp = m*wsub. The regroup to m packed
    # (R = F*wsub, HD) tiles splits the position axis at sublane-tile
    # boundaries and permutes whole (wsub, HD) planes — tile-granular vreg
    # moves, NOT the sublane-level (bp, F) swap that made the original
    # frame-major kernel run 5-7x above its HBM floor (round-3b profile).
    f, bp, hd = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]

    def regroup(ref):
        x = ref[0].reshape(f, m, wsub, hd)
        x = jnp.swapaxes(x, 0, 1)              # (m, F, wsub, HD): plane moves
        return x.reshape(m, f * wsub, hd)      # rows (f, w): free merge

    qt, kt, vt = regroup(q_ref), regroup(k_ref), regroup(v_ref)
    if n_positions % bp:
        # ragged position tail: zero out-of-range K/V rows (unspecified bits
        # would poison the 0-weighted PV products via NaN); Q rows need no
        # mask — their outputs are discarded by the clipped write-back.
        g = jax.lax.broadcasted_iota(jnp.int32, (m, f * wsub, 1), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (m, f * wsub, 1), 1)
        pos = pl.program_id(1) * bp + g * wsub + j % wsub
        valid = pos < n_positions
        kt = jnp.where(valid, kt, 0)
        vt = jnp.where(valid, vt, 0)
    bias = bias_ref[...][None, :, :]  # (1, R, R)
    o = _packed_heads_attend(qt, kt, vt, bias, o_ref.dtype, scale=scale,
                             heads=heads, d=d)
    o = jnp.swapaxes(o.reshape(m, f, wsub, hd), 0, 1)
    o_ref[0] = o.reshape(f, bp, hd)


def temporal_attention_fm(q: jax.Array, k: jax.Array, v: jax.Array, *,
                          heads: int, scale: float | None = None,
                          block_positions: int | None = None,
                          interpret: bool = False) -> jax.Array:
    """Frame-axis self-attention consuming the NATIVE (B, F, N, heads*D)
    layout — no HBM relayout on either side (the posmajor variant's hoisted
    transposes cost ~7 ms/step std and ~95-101 ms/step XL). Packing is
    (f, w)-ordered with a checkerboard mask; same math as the other
    variants (tests assert equality vs the einsum reference)."""
    b, f, n, hd = q.shape
    d = hd // heads
    if scale is None:
        scale = d**-0.5
    wsub, m_auto = choose_blocking_fm(f, hd, heads)
    if wsub == 0:
        raise ValueError(f"no frame-major packing for F={f} (need F<=128)")
    if block_positions is not None:
        bp = block_positions
        m = bp // wsub
    else:
        m = max(1, min(m_auto, pl.cdiv(n, wsub)))
        bp = m * wsub
        # prefer a bp that divides n: compiles out the ragged-tail K/V mask
        for cand in range(bp, max(wsub, bp // 2) - 1, -wsub):
            if n % cand == 0:
                bp = cand
                m = bp // wsub
                break
    grid = (b, pl.cdiv(n, bp))
    bias = _checkerboard_bias(wsub, f)
    kernel = functools.partial(_temporal_kernel_fm, scale=float(scale), m=m,
                               wsub=wsub, n_positions=n, heads=heads, d=d)
    interpret = interpret or jax.default_backend() != "tpu"
    r = wsub * f
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, f, bp, hd), lambda ib, ip: (ib, 0, ip, 0)),
            pl.BlockSpec((1, f, bp, hd), lambda ib, ip: (ib, 0, ip, 0)),
            pl.BlockSpec((1, f, bp, hd), lambda ib, ip: (ib, 0, ip, 0)),
            pl.BlockSpec((r, r), lambda ib, ip: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, f, bp, hd), lambda ib, ip: (ib, 0, ip, 0)),
        out_shape=jax.ShapeDtypeStruct((b, f, n, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v, bias)


def _block_diag_bias(w: int, f: int) -> jax.Array:
    """(R, R) f32 additive mask: 0 inside each position's (F, F) diagonal
    block, -inf across positions. Static -> folds to a constant."""
    r = w * f
    idx = jnp.arange(r, dtype=jnp.int32) // f
    return jnp.where(idx[:, None] == idx[None, :], 0.0, NEG_INF).astype(
        jnp.float32)


def _packed_heads_attend(qt, kt, vt, bias, out_dtype, *, scale: float,
                         heads: int, d: int):
    """Shared packed-attention body: qt/kt/vt are (gpp, R, heads*d) with
    position-major rows; returns (gpp, R, heads*d) in out_dtype. Heads are
    sliced in a static unroll (lane offsets stay static; head_dim can be
    non-128). Each head's output is cast to out_dtype BEFORE the concat —
    elementwise, so numerically identical to casting after, but it halves
    the statically-live unrolled temporaries (the posmajor VMEM model
    counts on this)."""
    outs = []
    for h in range(heads):
        qh = qt[:, :, h * d:(h + 1) * d]
        kh = kt[:, :, h * d:(h + 1) * d]
        vh = vt[:, :, h * d:(h + 1) * d]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias                      # (gpp, R, R)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=2, keepdims=True)
        og = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        outs.append((og / l).astype(out_dtype))   # divide on (gpp, R, d)
    return jnp.concatenate(outs, axis=-1)


def _temporal_kernel_pm(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                        scale: float, gpp: int, r: int, n_positions: int,
                        heads: int, d: int):
    # refs: (1, bp, F, HD), POSITION-major. The (bp, F, HD) -> (gpp, R, HD)
    # regroup is a pure view (bp = gpp*W, row = w*F + f is exactly the
    # packed-row order), so this kernel runs zero in-VMEM shuffles — the
    # frame-major variant's per-program swapaxes repacks dominated its
    # runtime (XL profile: 5-7x above the HBM floor; docs/PERF_NOTES.md).
    bp, f, hd = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    w = bp // gpp
    qt = q_ref[0].reshape(gpp, r, hd)
    kt = k_ref[0].reshape(gpp, r, hd)
    vt = v_ref[0].reshape(gpp, r, hd)
    if n_positions % bp:
        # ragged position tail: zero out-of-range K/V rows (unspecified bits
        # would poison the 0-weighted PV products via NaN); Q rows need no
        # mask — their outputs are discarded by the clipped write-back.
        g = jax.lax.broadcasted_iota(jnp.int32, (gpp, r, 1), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (gpp, r, 1), 1)
        pos = pl.program_id(1) * bp + g * w + j // f
        valid = pos < n_positions
        kt = jnp.where(valid, kt, 0)
        vt = jnp.where(valid, vt, 0)
    bias = bias_ref[...][None, :, :]  # (1, R, R)
    o = _packed_heads_attend(qt, kt, vt, bias, o_ref.dtype, scale=scale,
                             heads=heads, d=d)
    o_ref[0] = o.reshape(bp, f, hd)


def temporal_attention_posmajor(q: jax.Array, k: jax.Array, v: jax.Array, *,
                                heads: int, scale: float | None = None,
                                block_positions: int | None = None,
                                interpret: bool = False) -> jax.Array:
    """Frame-axis self-attention on POSITION-major inputs.

    q/k/v: (B, N, F, heads*D) — attention over F independently per
    (batch, position, head). Returns (B, N, F, heads*D) in q.dtype. The
    caller pays one HBM relayout per temporal module to feed this layout
    (layers.TransformerTemporal); in exchange the kernel's packed-row
    regroup is free and W = floor(128/F) packings that were sublane-illegal
    frame-major become usable (F=24 -> W=5/R=120 vs W=4/R=96)."""
    b, n, f, hd = q.shape
    d = hd // heads
    if scale is None:
        scale = d**-0.5
    w, bp_auto = choose_blocking_posmajor(f, hd, heads)
    if w == 0:
        raise ValueError(f"no position-major packing for F={f} (need F%8==0)")
    r = w * f
    if block_positions is not None:
        bp = block_positions
    else:
        bp = min(bp_auto, pl.cdiv(n, w) * w)  # don't exceed n by > one group
        # prefer a bp that divides n: compiles out the ragged-tail K/V mask
        # (and its in-VMEM masked copies) entirely, pad-free-flash style —
        # but never at the cost of halving the block
        for cand in range(bp, max(w, bp // 2) - 1, -w):
            if n % cand == 0:
                bp = cand
                break
    gpp = bp // w
    grid = (b, pl.cdiv(n, bp))
    bias = _block_diag_bias(w, f)
    kernel = functools.partial(_temporal_kernel_pm, scale=float(scale),
                               gpp=gpp, r=r, n_positions=n, heads=heads, d=d)
    interpret = interpret or jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bp, f, hd), lambda ib, ip: (ib, ip, 0, 0)),
            pl.BlockSpec((1, bp, f, hd), lambda ib, ip: (ib, ip, 0, 0)),
            pl.BlockSpec((1, bp, f, hd), lambda ib, ip: (ib, ip, 0, 0)),
            pl.BlockSpec((r, r), lambda ib, ip: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bp, f, hd), lambda ib, ip: (ib, ip, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, f, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v, bias)


def _temporal_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                     gpp: int, r: int, n_positions: int, heads: int, d: int):
    # refs: (1, F, bp, H*D). Repack once per tile to position-major rows and
    # view as gpp stacked groups: (F, bp, HD) -> (bp, F, HD) -> (gpp, R, HD).
    # Everything below is static-shaped batched math — one batched QK^T, one
    # wide softmax, one batched PV per head — so the VPU runs few big passes
    # instead of a fori of small ones (the fori schedule measured ~2.5 ms per
    # level-0 instance; batching targets the softmax fixed costs).
    f, bp = q_ref.shape[1], q_ref.shape[2]
    hd = q_ref.shape[3]
    qt = jnp.swapaxes(q_ref[0], 0, 1).reshape(gpp, r, hd)
    kt = jnp.swapaxes(k_ref[0], 0, 1).reshape(gpp, r, hd)
    vt = jnp.swapaxes(v_ref[0], 0, 1).reshape(gpp, r, hd)
    if n_positions % bp:
        # ragged position tail: out-of-bounds K/V rows hold unspecified bits
        # (NaN poisons even 0-weighted PV products) — zero them. Q rows need
        # no mask: their outputs are discarded on the masked write-back.
        row = jax.lax.broadcasted_iota(jnp.int32, (gpp, r, 1), 0) * r \
            + jax.lax.broadcasted_iota(jnp.int32, (gpp, r, 1), 1)
        pos = row // f + pl.program_id(1) * bp
        valid = pos < n_positions
        kt = jnp.where(valid, kt, 0)
        vt = jnp.where(valid, vt, 0)
    bias = bias_ref[...][None, :, :]  # (1, R, R)
    o = _packed_heads_attend(qt, kt, vt, bias, o_ref.dtype, scale=scale,
                             heads=heads, d=d)
    o = o.reshape(bp, f, hd)
    o_ref[0] = jnp.swapaxes(o, 0, 1)


def temporal_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                       heads: int, scale: float | None = None,
                       block_positions: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """Frame-axis self-attention, native layout.

    q/k/v: (B, F, N, heads*D) — attention over F independently per
    (batch, spatial position, head). Returns (B, F, N, heads*D) in q.dtype.
    Requires packing_width(F) > 0 (F <= 128).
    """
    b, f, n, hd = q.shape
    d = hd // heads
    if scale is None:
        scale = d**-0.5
    w, bp_auto = choose_blocking(f, hd, heads)
    if w == 0:
        raise ValueError(f"no legal MXU packing for F={f}, HD={hd}, "
                         f"heads={heads}")
    r = w * f
    if block_positions is not None:
        bp = block_positions
    else:
        # don't exceed n by more than one alignment unit (tiny-n test shapes)
        align = (8 // math.gcd(w, 8)) * w
        bp = min(bp_auto, max(align, pl.cdiv(n, align) * align))
    gpp = bp // w
    grid = (b, pl.cdiv(n, bp))

    bias = _block_diag_bias(w, f)
    kernel = functools.partial(_temporal_kernel, scale=float(scale), gpp=gpp,
                               r=r, n_positions=n, heads=heads, d=d)
    interpret = interpret or jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, f, bp, hd), lambda ib, ip: (ib, 0, ip, 0)),
            pl.BlockSpec((1, f, bp, hd), lambda ib, ip: (ib, 0, ip, 0)),
            pl.BlockSpec((1, f, bp, hd), lambda ib, ip: (ib, 0, ip, 0)),
            pl.BlockSpec((r, r), lambda ib, ip: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, f, bp, hd), lambda ib, ip: (ib, 0, ip, 0)),
        out_shape=jax.ShapeDtypeStruct((b, f, n, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v, bias)


def temporal_attention_posmajor_reference(q, k, v, *, heads, scale=None):
    """Reference for the position-major layout: transpose to frame-major,
    run the einsum reference, transpose back (same math, same dtypes)."""
    out = temporal_attention_reference(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        heads=heads, scale=scale)
    return jnp.swapaxes(out, 1, 2)


def temporal_attention_reference(q, k, v, *, heads, scale=None):
    """The einsum path of layers._FrameAxisAttention (bit-reference)."""
    b, f, n, hd = q.shape
    d = hd // heads
    if scale is None:
        scale = d**-0.5
    qh = q.reshape(b, f, n, heads, d)
    kh = k.reshape(b, f, n, heads, d)
    vh = v.reshape(b, f, n, heads, d)
    logits = jnp.einsum("bfnhd,bgnhd->bnhfg", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnhfg,bgnhd->bfnhd", probs, vh,
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype).reshape(b, f, n, hd)
