"""Fused spatial transformer TAIL: everything in a BasicTransformerBlock
after attn1's PV output — attn1 out-projection + residual, LN2 + text
cross-attention + residual, LN3 + GEGLU FF + residual — as ONE row-local
pallas kernel.

Why this cut: attn1 (full self-attention over S up to 9216 tokens) needs the
whole sequence's K/V and already runs at its D=64 flash ceiling
(ops/pallas/flash_attention); everything AFTER its PV output is row-local —
the cross-attention context is 77 text tokens whose K/V projections don't
depend on x, so they precompute outside and sit VMEM-resident. The unfused
tail costs per-op, not FLOPs: the cross-attention einsum materialises
(B, H, S, 77) f32 logits through HBM, and x round-trips HBM ~8x through the
out-proj/LN/residual chain (fusion_attrib round-4 dump: fusions+copies
dominate the standard step's tail). Here x and the attn1 output stream
HBM->VMEM once, LN statistics stay in registers, the 77-token attention is
a VMEM-resident matmul pair, and the FF reuses the geglu_ff inner-blocked
exact-accumulation schedule.

Numerics match the unfused flax path within bf16 rounding: f32 LN moments,
f32 matmul accumulation with bf16 rounding where nn.Dense materialises,
softmax in f32 with probs rounded to the value dtype before PV (the
ops.attention._xla_attention convention), exact-erf gelu. Context is padded
to the 128-lane tile with an additive -1e9 bias — exp underflows to exactly
0.0 in f32, so the softmax equals the unpadded one bitwise.

Capability parity: diffusers BasicTransformerBlock inside Transformer2DModel
(`/root/reference/InferNet/neurons/miner.py:83-87` via diffusers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geglu_ff import _gelu_exact

# resident-weight bound: (3*HD*C + 12*C^2) bf16 (attn1 out-proj, attn2 q and
# out-proj, GEGLU pair) must leave room for the streamed row tiles
_MAX_DIM = 384
# static GEGLU inner-block width (exact accumulation; the geglu_ff schedule)
_FF_INNER_BLOCK = 256
# context tokens pad to full lanes; bound the resident K/V + logit width
_MAX_CTX = 512
_NEG_INF = -1e9


def choose_block_rows(s: int, c: int, hd: int, t_pad: int,
                      heads: int = 1) -> int:
    """Row-tile height bs for the fused tail kernel (0 = infeasible).

    VMEM model: resident weights 2*(3*HD*C + 12*C^2) bytes + resident context
    K/V 4*HD*t_pad + per-row live set (~16 bf16 row copies across the chain,
    the f32 FF accumulator, 4 live (_FF_INNER_BLOCK,) f32 FF temporaries,
    f32 softmax temporaries of width t_pad). bs must divide S (no ragged
    tail) and be sublane-aligned."""
    if c > _MAX_DIM or hd > _MAX_DIM or t_pad > _MAX_CTX:
        return 0
    weights = 2 * (3 * hd * c + 12 * c * c)
    ctx = 4 * hd * t_pad * heads    # block-diag K/V stored dense
    per_row = (16 * (c + hd) + 4 * c + 16 * _FF_INNER_BLOCK
               + 12 * heads * t_pad)  # f32 logit/exp/prob rows
    budget = 9 * 2**20 - weights - ctx
    if budget <= 0:
        return 0
    cap = min(budget // per_row, 512, s)
    for bs in range(cap - cap % 8, 7, -8):
        if s % bs == 0:
            return bs
    return s if s < 8 and s % 2 == 0 else 0


def _ln(x, scale, bias, eps):
    """flax nn.LayerNorm math (f32 fast-variance moments) -> x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _mm(x, w):
    """(R, A) @ (A, B) -> (R, B), f32 accumulation, rounded to x.dtype like
    nn.Dense(dtype=...)."""
    o = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return o.astype(x.dtype)


def _tail_kernel(x_ref, o1_ref, kt_ref, v_ref, cbias_ref,
                 o1w, o1b, ln2s, ln2b, q2w, o2w, o2b,
                 ln3s, ln3b, ffiw, ffib, ffow, ffob, o_ref, *,
                 scale: float, heads: int, inner: int, eps: float):
    x = x_ref[0]                                       # (bs, C)
    dt = x.dtype
    x = x + _mm(o1_ref[0], o1w[...]) + o1b[...].astype(dt)

    h = _ln(x, ln2s[...], ln2b[...], eps)
    q = _mm(h, q2w[...])                               # (bs, HD)
    # ALL heads in two MXU matmuls: k/v are packed block-diagonally outside
    # ((HD, heads*Tp) / (heads*Tp, HD)) so head strips never mix — the
    # off-diagonal zeros contribute exact 0 to every cross-head term. The
    # per-head loop of (bs, d) x (d, Tp) matmuls this replaces was
    # latency-bound (measured ~4x above the kernel's MXU floor).
    bsz = q.shape[0]
    tp = cbias_ref.shape[1] // heads
    logits = jax.lax.dot_general(q, kt_ref[0], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    logits = (logits * scale + cbias_ref[...]).reshape(bsz, heads, tp)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
    ao = jax.lax.dot_general(p.reshape(bsz, heads * tp), v_ref[0],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(dt)
    x = x + _mm(ao, o2w[...]) + o2b[...].astype(dt)

    h = _ln(x, ln3s[...], ln3b[...], eps)
    # GEGLU FF, inner dim statically blocked (exact: GEGLU is linear in the
    # proj_out contraction — the geglu_ff schedule); live f32 temporaries
    # stay (bs, _FF_INNER_BLOCK)-sized.
    n_i = inner // _FF_INNER_BLOCK if inner % _FF_INNER_BLOCK == 0 else 1
    bi = inner // n_i
    acc = jnp.zeros(x.shape, jnp.float32)
    for i in range(n_i):
        vsl = slice(i * bi, (i + 1) * bi)
        gsl = slice(inner + i * bi, inner + (i + 1) * bi)
        val = jax.lax.dot_general(h, ffiw[:, vsl], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        val = val + ffib[0:1, vsl].astype(jnp.float32)
        gate = jax.lax.dot_general(h, ffiw[:, gsl], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        gate = gate + ffib[0:1, gsl].astype(jnp.float32)
        # round where the unfused path materialises; gate in f32
        val = val.astype(dt).astype(jnp.float32)
        gate = gate.astype(dt).astype(jnp.float32)
        hf = (val * _gelu_exact(gate)).astype(dt)
        acc = acc + jax.lax.dot_general(hf, ffow[vsl, :],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    o_ref[0] = x + (acc + ffob[...].astype(jnp.float32)).astype(dt)


def choose_block_rows_streamed(s: int, c: int, hd: int, t_pad: int,
                               heads: int = 1,
                               ff_block: int = _FF_INNER_BLOCK) -> int:
    """Row-tile height for the STREAMED-weight tail kernel (0 = infeasible).

    The resident kernel refuses C > 384 because the GEGLU pair alone is
    12*C^2 bf16 (12.3 MB at C=640). Here the FF weights STREAM through the
    grid's inner dimension exactly as ops/pallas/geglu_ff schedules them —
    double-buffered (C, bi)/(bi, C) tiles — so only the small chain weights
    (~3*HD*C) and the context K/V stay resident. VMEM model: 13 MB budget
    (scoped VMEM is 16 MB; headroom for compiler temporaries) minus
    residents minus 2x double-buffered FF tiles, divided by the per-row
    live set (chain copies + bf16 xmid/h scratch + f32 FF accumulator +
    (bs, bi) f32 val/gate tiles + f32 softmax rows)."""
    if c > 768 or hd > 768 or t_pad > _MAX_CTX:
        return 0
    weights = 2 * (3 * hd * c + 4 * c)          # o1/q2/o2 (+ biases, LNs)
    ctx = 4 * hd * t_pad * heads
    ff_tiles = 2 * 6 * c * ff_block             # 2 buffers x (wv+wg+wo) bf16
    per_row = (16 * (c + hd) + 12 * c          # chain copies + acc + scratch
               + 18 * ff_block                  # f32 val/gate + bf16 h tile
               + 12 * heads * t_pad)            # f32 logits/exp + bf16 probs
    budget = 13 * 2**20 - weights - ctx - ff_tiles
    if budget <= 0:
        return 0
    cap = min(budget // per_row, 512, s)
    for bs in range(cap - cap % 8, 7, -8):
        if s % bs == 0:
            return bs
    return s if s < 8 and s % 2 == 0 else 0


def _tail_kernel_streamed(x_ref, o1_ref, kt_ref, v_ref, cbias_ref,
                          o1w, o1b, ln2s, ln2b, q2w, o2w, o2b,
                          ln3s, ln3b,
                          wv_ref, bv_ref, wg_ref, bg_ref, wo_ref, ffob,
                          o_ref, xmid_ref, h_ref, acc_ref, *,
                          scale: float, heads: int, eps: float):
    """Streamed variant: grid (N, S/bs, n_inner); the post-attn chain runs
    once per row tile (ii == 0) into VMEM scratch, then the GEGLU pair
    accumulates per streamed inner block (the geglu_ff schedule — exact,
    since GEGLU is linear in the proj_out contraction)."""
    ii = pl.program_id(2)
    n_i = pl.num_programs(2)

    @pl.when(ii == 0)
    def _pre():
        x = x_ref[0]                                   # (bs, C)
        dt = x.dtype
        x = x + _mm(o1_ref[0], o1w[...]) + o1b[...].astype(dt)
        h2 = _ln(x, ln2s[...], ln2b[...], eps)
        q = _mm(h2, q2w[...])                          # (bs, HD)
        bsz = q.shape[0]
        tp = cbias_ref.shape[1] // heads
        logits = jax.lax.dot_general(q, kt_ref[0], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        logits = (logits * scale + cbias_ref[...]).reshape(bsz, heads, tp)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        ao = jax.lax.dot_general(p.reshape(bsz, heads * tp), v_ref[0],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32).astype(dt)
        x = x + _mm(ao, o2w[...]) + o2b[...].astype(dt)
        xmid_ref[...] = x
        h_ref[...] = _ln(x, ln3s[...], ln3b[...], eps)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = h_ref[...]
    dt = h.dtype
    val = jax.lax.dot_general(h, wv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    val = val + bv_ref[...].astype(jnp.float32)
    gate = jax.lax.dot_general(h, wg_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    gate = gate + bg_ref[...].astype(jnp.float32)
    val = val.astype(dt).astype(jnp.float32)
    gate = gate.astype(dt).astype(jnp.float32)
    hf = (val * _gelu_exact(gate)).astype(dt)
    acc_ref[...] += jax.lax.dot_general(hf, wo_ref[...],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    @pl.when(ii == n_i - 1)
    def _done():
        o = acc_ref[...] + ffob[...].astype(jnp.float32)
        o_ref[0] = xmid_ref[...] + o.astype(dt)


def _streamed_call(x, o1, kt, vp, cbias, params, *, heads, scale, eps,
                   bs, t_pad, interpret):
    n, s, c = x.shape
    hd1 = o1.shape[-1]
    hd = params["q2_w"].shape[1]
    dt = x.dtype
    inner = params["ffi_w"].shape[1] // 2
    # inner block: largest 128-multiple divisor within the FF tile budget
    bi = _FF_INNER_BLOCK
    while inner % bi and bi > 128:
        bi -= 128
    if inner % bi:
        bi = inner
    n_i = inner // bi

    def w(name):
        return params[name].astype(dt)

    def vec(name, width, vdt=jnp.float32):
        return params[name].reshape(1, width).astype(vdt)

    ffi = w("ffi_w")
    wv, wg = ffi[:, :inner], ffi[:, inner:]
    bvv = params["ffi_b"][:inner].reshape(1, inner).astype(dt)
    bgg = params["ffi_b"][inner:].reshape(1, inner).astype(dt)

    const = lambda i_, j_, k_: (0, 0)  # noqa: E731
    row = lambda width: pl.BlockSpec((1, bs, width),  # noqa: E731
                                     lambda i_, j_, k_: (i_, j_, 0))
    per_img = lambda a, b_: pl.BlockSpec((1, a, b_),  # noqa: E731
                                         lambda i_, j_, k_: (i_, 0, 0))
    wspec = lambda arr: pl.BlockSpec(arr.shape, const)  # noqa: E731

    small = [
        w("o1_w"), vec("o1_b", c, dt),
        vec("ln2_s", c), vec("ln2_b", c), w("q2_w"),
        w("o2_w"), vec("o2_b", c, dt),
        vec("ln3_s", c), vec("ln3_b", c),
    ]
    operands = [x, o1.astype(dt), kt, vp, cbias] + small + [
        wv, bvv, wg, bgg, w("ffo_w"), vec("ffo_b", c)]
    specs = ([row(c), row(hd1), per_img(hd, cbias.shape[1]),
              per_img(cbias.shape[1], hd), wspec(cbias)]
             + [wspec(a) for a in small]
             + [pl.BlockSpec((c, bi), lambda i_, j_, k_: (0, k_)),
                pl.BlockSpec((1, bi), lambda i_, j_, k_: (0, k_)),
                pl.BlockSpec((c, bi), lambda i_, j_, k_: (0, k_)),
                pl.BlockSpec((1, bi), lambda i_, j_, k_: (0, k_)),
                pl.BlockSpec((bi, c), lambda i_, j_, k_: (k_, 0)),
                wspec(vec("ffo_b", c))])

    kernel = functools.partial(_tail_kernel_streamed, scale=float(scale),
                               heads=heads, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(n, s // bs, n_i),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, bs, c), lambda i_, j_, k_: (i_, j_, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, c), dt),
        scratch_shapes=[pltpu.VMEM((bs, c), dt), pltpu.VMEM((bs, c), dt),
                        pltpu.VMEM((bs, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)


def fused_spatial_tail(x: jax.Array, o1: jax.Array, ctx_k: jax.Array,
                       ctx_v: jax.Array, params: dict, *, heads: int,
                       scale: float | None = None, eps: float = 1e-5,
                       block_rows: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """Run a BasicTransformerBlock's post-attn1 tail.

    x: (N, S, C) block input (attn1's residual source); o1: (N, S, HD1)
    attn1's PV output (pre out-projection; HD1 may be the mh-native kernel's
    lane-padded heads*dp width — o1_w must then be the matching
    pad_head_rows weight); ctx_k/ctx_v: (N, T, HD) pre-projected context
    keys/values (to_k/to_v applied outside — they are x-independent).
    params: flat dict with o1_{w,b}; ln{2,3}_{s,b}; q2_w; o2_{w,b};
    ffi_{w,b}; ffo_{w,b} — the flax module's arrays."""
    n, s, c = x.shape
    hd1 = o1.shape[-1]
    hd = params["q2_w"].shape[1]
    d = hd // heads
    t = ctx_k.shape[1]
    inner = params["ffi_w"].shape[1] // 2
    if scale is None:
        scale = d**-0.5
    t_pad = max(128, -(-t // 128) * 128)
    import os

    env_bs = os.environ.get("DVDX_SPATIAL_TAIL_BS", "")
    if block_rows is None and env_bs:
        block_rows = int(env_bs)
    # impl select: resident (weights VMEM-resident, C <= 384) vs streamed
    # (FF pair streamed through the grid, C <= 768 — the C=640 zeroscope
    # level). Env DVDX_SPATIAL_TAIL_IMPL forces one for A/B runs.
    impl = os.environ.get("DVDX_SPATIAL_TAIL_IMPL", "")
    bs = block_rows if block_rows is not None else (
        0 if impl == "streamed" else choose_block_rows(
            s, c, max(hd, hd1), t_pad, heads))
    streamed = False
    if (bs == 0 or s % bs) and impl != "resident" and block_rows is None:
        bs = choose_block_rows_streamed(s, c, max(hd, hd1), t_pad, heads)
        streamed = True
    if bs == 0 or s % bs:
        raise ValueError(f"no fused-tail blocking for S={s}, C={c}, HD={hd}")
    dt = x.dtype

    # block-diagonal packing: K^T strips on the (d, Tp) diagonal blocks of
    # (HD, heads*Tp), V strips on the (Tp, d) diagonal blocks of
    # (heads*Tp, HD) — the kernel runs ALL heads as two MXU matmuls and the
    # off-diagonal zeros make every cross-head product exactly 0.
    pad = [(0, 0), (0, t_pad - t), (0, 0)]
    kp = jnp.pad(ctx_k.astype(dt), pad)                      # (N, Tp, HD)
    vp0 = jnp.pad(ctx_v.astype(dt), pad)
    eye = jnp.eye(heads, dtype=dt)
    # (N, Tp, h, d) -> (N, h*Tp, h, d) with strip h' zeroed unless h' == h
    kh = kp.reshape(n, t_pad, heads, d)
    kbd = jnp.einsum("nthd,hg->nhtgd", kh, eye).reshape(
        n, heads * t_pad, hd)
    kt = jnp.swapaxes(kbd, 1, 2)                             # (N, HD, h*Tp)
    vh = vp0.reshape(n, t_pad, heads, d)
    vp = jnp.einsum("nthd,hg->nhtgd", vh, eye).reshape(
        n, heads * t_pad, hd)                                # (N, h*Tp, HD)
    cbias = jnp.where(
        (jnp.arange(heads * t_pad)[None, :] % t_pad) < t, 0.0,
        _NEG_INF).astype(jnp.float32)                        # (1, h*Tp)

    interpret = interpret or jax.default_backend() != "tpu"
    if streamed:
        return _streamed_call(x, o1, kt, vp, cbias, params, heads=heads,
                              scale=scale, eps=eps, bs=bs, t_pad=t_pad,
                              interpret=interpret)

    def w(name):
        return params[name].astype(dt)

    def vec(name, width, vdt=jnp.float32):
        return params[name].reshape(1, width).astype(vdt)

    const = lambda i_, j_: (0, 0)  # noqa: E731
    row = lambda width: pl.BlockSpec((1, bs, width),  # noqa: E731
                                     lambda i_, j_: (i_, j_, 0))
    per_img = lambda a, b_: pl.BlockSpec((1, a, b_),  # noqa: E731
                                         lambda i_, j_: (i_, 0, 0))
    wspec = lambda arr: pl.BlockSpec(arr.shape, const)  # noqa: E731

    weights = [
        w("o1_w"), vec("o1_b", c, dt),
        vec("ln2_s", c), vec("ln2_b", c), w("q2_w"),
        w("o2_w"), vec("o2_b", c, dt),
        vec("ln3_s", c), vec("ln3_b", c),
        w("ffi_w"), vec("ffi_b", 2 * inner), w("ffo_w"), vec("ffo_b", c),
    ]
    operands = [x, o1.astype(dt), kt, vp, cbias] + weights
    specs = [row(c), row(hd1), per_img(hd, heads * t_pad),
             per_img(heads * t_pad, hd),
             wspec(cbias)] + [wspec(a) for a in weights]

    kernel = functools.partial(
        _tail_kernel, scale=float(scale), heads=heads, inner=inner,
        eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(n, s // bs),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, bs, c), lambda i_, j_: (i_, j_, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*operands)
