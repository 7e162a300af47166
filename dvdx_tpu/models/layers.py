"""Shared Flax building blocks for the video-diffusion model family.

TPU-first conventions (vs the reference's torch/diffusers NCHW stack):
* channel-LAST everywhere — (B, F, H, W, C); XLA's TPU conv/matmul tiling wants
  the contracting/feature dim innermost (lane dim = 128).
* attention via ops.attention (single dispatch point; pallas flash kernel for
  long sequences).
* temporal mixing layers are residual with zero-initialised output projections
  so a freshly-initialised 3D model equals its 2D spatial slice — same trick
  ModelScope/Zeroscope training uses and it keeps golden tests local.

Reference architecture being matched capability-for-capability:
diffusers UNet3DConditionModel as loaded at
`/root/reference/Distribution/strategies/fsdp.py:55-62` and
`/root/reference/InferNet/neurons/miner.py:83-87`.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention, ring_active

# Gate for the XL-geometry layout fixes (frame-major checkerboard temporal
# attention; 1x1-conv spatial projections): measured WIN at the XL geometry
# (level-0 N=9216: the posmajor hoist transposes cost 95-101 ms/step; with
# level-1 N=2304/F=24 included the step is -50.5 ms) but a small LOSS at the
# standard geometry (N=2880/F=16: +3-6 ms/step of new layout-crossing
# copies). docs/PERF_NOTES.md round 4.
_FM_MIN_TOKENS = 4096


def _wants_fm_layout(f: int, n: int) -> bool:
    return n >= _FM_MIN_TOKENS or (f >= 24 and n >= 1024)


def _kernel_impl(env_var: str) -> str:
    """Per-kernel dispatch: '' -> auto (pallas on TPU, xla elsewhere);
    'pallas'/'xla' force. Read at trace time so bench A/Bs can flip paths
    without editing code."""
    import os

    forced = os.environ.get(env_var, "")
    if forced:
        return forced
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding, f32. t: (B,) int/float -> (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimeEmbedding(nn.Module):
    """MLP over the sinusoidal embedding -> (B, time_embed_dim)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sinusoid: jax.Array) -> jax.Array:
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="fc1")(sinusoid.astype(self.dtype))
        h = nn.silu(h)
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="fc2")(h)
        return h


class FusedGroupNorm(nn.Module):
    """GroupNorm(+pre-bias)(+SiLU) with nn.GroupNorm's parameter tree
    ('scale'/'bias', f32) but computed by ops.groupnorm.group_norm_act — a
    one-pass pallas kernel on TPU (1 HBM read instead of XLA's 2; the UNet
    step is activation-HBM-bound, docs/PERF_NOTES.md), an equivalent jnp
    path elsewhere. Statistics span every non-leading axis (per-frame GN
    semantics of diffusers ResnetBlock2D/Transformer2DModel)."""

    groups: int
    eps: float
    act: str = "none"           # 'none' | 'silu'

    @nn.compact
    def __call__(self, x: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
        from ..ops.groupnorm import group_norm_act

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_act(x, scale, b, groups=self.groups, eps=self.eps,
                              act=self.act, bias=bias)


class ResnetBlock2D(nn.Module):
    """Spatial resnet block applied per-frame on (N, H, W, C).

    Semantics (incl. GroupNorm eps=1e-5 and temb injection point) match
    diffusers ResnetBlock2D so pretrained UNet3D weights load exactly
    (utils/convert.py). Both GroupNorm->SiLU pairs (and the time-embedding
    add feeding norm2) run as the fused one-pass kernel."""

    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5

    def _gn_silu(self, x, name, bias=None):
        """GroupNorm+SiLU (+pre-bias): the pallas kernel where it measured
        faster (deep-level rows), the ORIGINAL nn.GroupNorm program
        everywhere else — an f32-twin fallback lowered 4% slower end-to-end
        (docs/PERF_NOTES.md round-3 GN study). Both branches create the same
        {name: scale, bias} params, so checkpoints are branch-agnostic."""
        from ..ops.groupnorm import wants_pallas

        if wants_pallas(x.shape, self.groups):
            return FusedGroupNorm(self.groups, self.eps, act="silu",
                                  name=name)(x, bias)
        if bias is not None:
            x = x + bias[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name=name)(x)
        return nn.silu(h)

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        # x: (N, H, W, C); temb: (N, D)
        residual = x
        h = self._gn_silu(x, "norm1")
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = self._gn_silu(h, "norm2", bias=t)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(residual)
        return residual + h


class TemporalConvBlock(nn.Module):
    """Residual stack of (3,1,1) 3D convs over (B, F, H, W, C); last conv
    zero-init so the block is identity at init.

    With num_layers=4 this is exactly diffusers TemporalConvLayer (conv1..4,
    each GroupNorm(32, eps=1e-5)+SiLU+Conv3d(k=(3,1,1)); conv4 zero-init by
    the original training recipe too) — pretrained weights load 1:1."""

    channels: int
    num_layers: int = 2
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        for i in range(self.num_layers):
            h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                             dtype=self.dtype, name=f"norm{i}")(h)
            h = nn.silu(h)
            last = i == self.num_layers - 1
            h = nn.Conv(
                self.channels,
                (3, 1, 1),
                padding=((1, 1), (0, 0), (0, 0)),
                dtype=self.dtype,
                kernel_init=nn.initializers.zeros if last else nn.initializers.lecun_normal(),
                name=f"conv{i}_zero" if last else f"conv{i}",
            )(h)
        return x + h


class _DenseParams(nn.Module):
    """Declares exactly nn.Dense's parameter tree (kernel lecun_normal, bias
    zeros, f32) without running its compute — lets a pallas kernel consume
    Dense-compatible checkpoints. Same param names + init draws as nn.Dense."""

    features: int
    use_bias: bool = True   # False matches nn.Dense(use_bias=False)'s tree
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", self.kernel_init,
                       (in_features, self.features), jnp.float32)
        if not self.use_bias:
            return k, None
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP, matching diffusers FeedForward(activation_fn='geglu'):
    exact-erf gelu (torch F.gelu default), chunk order (value, gate).

    On TPU the whole MLP runs as one pallas kernel (ops/pallas/geglu_ff) so
    the 8x-width inner tensor never touches HBM — at the flagship geometry
    the unfused level-0 intermediate is 472 MB per FF call and the step is
    activation-HBM-bound (docs/PERF_NOTES.md round-3 profile). The fallback
    branch is LITERALLY the original nn.Dense program (the round-3 GN study
    showed 'equivalent' re-lowered fallbacks can cost 4%)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.mult
        if _kernel_impl("DVDX_FF_IMPL") == "pallas" and x.shape[-1] == self.dim:
            from ..ops.pallas.geglu_ff import geglu_ff

            w_in, b_in = _DenseParams(inner * 2, name="proj_in")(self.dim)
            w_out, b_out = _DenseParams(self.dim, name="proj_out")(inner)
            return geglu_ff(x.astype(self.dtype), w_in, b_in, w_out, b_out)
        hg = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(hg, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class Attention(nn.Module):
    """Projected multi-head attention. x: (B, S, C), context: (B, T, Cx)."""

    num_heads: int
    head_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    zero_init_out: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        from ..ops.attention import wants_native_mh

        if not self.zero_init_out and wants_native_mh(
                x.shape[1], ctx.shape[1], self.num_heads, self.head_dim):
            # multi-head-NATIVE path: the flash kernel consumes the
            # projections' (B, S, H*dp) layout, so the 4 head-major HBM
            # transposes of the classic schedule never exist. Head strips
            # are zero-padded to 128 lanes at the WEIGHT (free at runtime;
            # exact — zero terms in QK, zero output lanes through PV).
            # Param trees are identical to the nn.Dense branch below, so
            # checkpoints and init draws are branch-agnostic.
            from ..ops.pallas.flash_attention import (flash_attention_mh,
                                                      pad_head_columns,
                                                      pad_head_rows)

            dt = self.dtype
            wq, _ = _DenseParams(inner, use_bias=False, name="to_q")(x.shape[-1])
            wk, _ = _DenseParams(inner, use_bias=False, name="to_k")(ctx.shape[-1])
            wv, _ = _DenseParams(inner, use_bias=False, name="to_v")(ctx.shape[-1])
            h_, d_ = self.num_heads, self.head_dim
            qp = jnp.dot(x.astype(dt), pad_head_columns(wq.astype(dt), h_, d_))
            kp = jnp.dot(ctx.astype(dt), pad_head_columns(wk.astype(dt), h_, d_))
            vp = jnp.dot(ctx.astype(dt), pad_head_columns(wv.astype(dt), h_, d_))
            o = flash_attention_mh(qp, kp, vp, heads=h_, head_dim=d_)
            wo, bo = _DenseParams(self.out_dim, name="to_out")(inner)
            return (jnp.dot(o, pad_head_rows(wo.astype(dt), h_, d_))
                    + bo.astype(dt))

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        b, s = q.shape[0], q.shape[1]
        t = k.shape[1]
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, t, self.num_heads, self.head_dim)
        v = v.reshape(b, t, self.num_heads, self.head_dim)
        o = multi_head_attention(q, k, v)
        o = o.reshape(b, s, inner)
        out_init = nn.initializers.zeros if self.zero_init_out else nn.initializers.lecun_normal()
        out_name = "to_out_zero" if self.zero_init_out else "to_out"
        return nn.Dense(self.out_dim, dtype=self.dtype, kernel_init=out_init, name=out_name)(o)


def _fused_spatial_tail_wants(s: int, dim: int, heads: int, head_dim: int,
                              ctx_tokens: int) -> bool:
    """True when BasicTransformerBlock's post-attn1 tail should run as ONE
    pallas kernel (ops/pallas/spatial_tail) — TPU, resident-weight bound.
    Env DVDX_SPATIAL_BLOCK_IMPL: 'pallas' forces, 'xla' disables."""
    import os

    if ring_active():
        return False
    forced = os.environ.get("DVDX_SPATIAL_BLOCK_IMPL", "")
    if forced:
        if forced != "pallas":
            return False
    elif (jax.default_backend() != "tpu" or s < 512
          # explicit attention/FF overrides select those unfused paths
          # (mh-native attn1 COMPOSES with the fused tail — not excluded)
          or os.environ.get("DVDX_ATTN_IMPL", "") == "xla"
          or os.environ.get("DVDX_FF_IMPL", "") == "xla"):
        return False
    from ..ops.pallas.spatial_tail import (choose_block_rows,
                                           choose_block_rows_streamed)

    t_pad = max(128, -(-ctx_tokens // 128) * 128)
    impl = os.environ.get("DVDX_SPATIAL_TAIL_IMPL", "")
    if impl != "streamed" and choose_block_rows(
            s, dim, heads * head_dim, t_pad) > 0:
        return True
    # C=640 rows: FF weights stream through the grid instead of living
    # VMEM-resident (the measured half of the round-4 "closed by
    # arithmetic" lever — docs/PERF_NOTES.md round-5)
    return impl != "resident" and choose_block_rows_streamed(
        s, dim, heads * head_dim, t_pad, heads) > 0


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU FF; all residual.

    Matches diffusers BasicTransformerBlock (LayerNorm eps=1e-5, torch
    default). When cross_attention_dim is set but context is None the attn2
    branch self-attends — exactly how diffusers' temporal transformer blocks
    behave (temp_attentions are built with a cross dim but never receive
    encoder states)."""

    dim: int
    num_heads: int
    head_dim: int
    cross_attention_dim: Optional[int] = None
    # diffusers double_self_attention: attn2/norm2 exist even without a cross
    # dim and self-attend (every TransformerTemporalModel block has this on)
    double_self: bool = False
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        if (context is not None and not self.double_self
                and _fused_spatial_tail_wants(
                    x.shape[1], self.dim, self.num_heads, self.head_dim,
                    context.shape[1])):
            # post-attn1 tail as ONE pallas kernel: attn1 keeps its flash
            # ceiling; the out-proj/LN2/cross-attn/LN3/GEGLU chain — whose
            # unfused cost is HBM round-trips of x and a materialised
            # (B, H, S, 77) logit tensor — streams x once. Param tree is
            # identical to the unfused branch (checkpoints branch-agnostic).
            from ..ops.pallas.spatial_tail import fused_spatial_tail

            dt = self.dtype
            inner = self.num_heads * self.head_dim
            h = nn.LayerNorm(epsilon=self.eps, dtype=dt, name="norm1")(x)
            q1w, k1w, v1w, o1w, o1b = _AttnParams(
                inner, self.dim, name="attn1")(self.dim)
            hd_ = h.astype(dt)
            b_, s_ = x.shape[0], x.shape[1]
            from ..ops.attention import wants_native_mh

            if wants_native_mh(s_, s_, self.num_heads, self.head_dim):
                # mh-native attn1 composes with the fused tail: the kernel's
                # o1 operand carries the lane-padded heads*dp width and o1_w
                # is the matching pad_head_rows weight — exact math.
                from ..ops.pallas.flash_attention import (flash_attention_mh,
                                                          pad_head_columns,
                                                          pad_head_rows)

                h_n, d_n = self.num_heads, self.head_dim
                o1 = flash_attention_mh(
                    jnp.dot(hd_, pad_head_columns(q1w.astype(dt), h_n, d_n)),
                    jnp.dot(hd_, pad_head_columns(k1w.astype(dt), h_n, d_n)),
                    jnp.dot(hd_, pad_head_columns(v1w.astype(dt), h_n, d_n)),
                    heads=h_n, head_dim=d_n)
                o1w = pad_head_rows(o1w.astype(dt), h_n, d_n)
            else:

                def heads_(t):
                    return t.reshape(b_, t.shape[1], self.num_heads,
                                     self.head_dim)

                o1 = multi_head_attention(
                    heads_(jnp.dot(hd_, q1w.astype(dt))),
                    heads_(jnp.dot(hd_, k1w.astype(dt))),
                    heads_(jnp.dot(hd_, v1w.astype(dt)))).reshape(
                        b_, s_, inner)
            q2w, k2w, v2w, o2w, o2b = _AttnParams(
                inner, self.dim, name="attn2")(
                    self.dim, kv_features=context.shape[-1])
            ctxd = context.astype(dt)
            ln2 = _LNParams(self.dim, name="norm2")()
            ln3 = _LNParams(self.dim, name="norm3")()
            ff = _FFParams(self.dim, name="ff")()
            params = {
                "o1_w": o1w, "o1_b": o1b,
                "ln2_s": ln2[0], "ln2_b": ln2[1], "q2_w": q2w,
                "o2_w": o2w, "o2_b": o2b,
                "ln3_s": ln3[0], "ln3_b": ln3[1],
                "ffi_w": ff[0], "ffi_b": ff[1],
                "ffo_w": ff[2], "ffo_b": ff[3],
            }
            return fused_spatial_tail(
                x.astype(dt), o1,
                jnp.dot(ctxd, k2w.astype(dt)), jnp.dot(ctxd, v2w.astype(dt)),
                params, heads=self.num_heads, eps=self.eps)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.num_heads, self.head_dim, self.dim, dtype=self.dtype, name="attn1")(h)
        if self.cross_attention_dim is not None or self.double_self:
            h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm2")(x)
            x = x + Attention(self.num_heads, self.head_dim, self.dim, dtype=self.dtype, name="attn2")(
                h, context
            )
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm3")(x)
        x = x + GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """Per-frame spatial transformer with text cross-attention.
    x: (N, H, W, C), context: (N, T, Cx)."""

    num_heads: int
    head_dim: int
    cross_attention_dim: int
    depth: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        n, hh, ww, c = x.shape
        residual = x
        # diffusers Transformer2DModel: GroupNorm(32, eps=1e-6); its 1x1-conv
        # proj_in/out (use_linear_projection=False) is Dense math — the
        # converter reshapes (C,C,1,1) conv kernels into (C,C). Fused pallas
        # GN only at the deep-level rows where it measured faster.
        from ..ops.groupnorm import wants_pallas

        if wants_pallas(x.shape, self.groups):
            h = FusedGroupNorm(self.groups, 1e-6, act="none", name="norm")(x)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                             dtype=self.dtype, name="norm")(x)
        import os as _os_

        _forced_proj = _os_.environ.get("DVDX_SPATIAL_PROJ_IMPL", "")
        if (_forced_proj == "pallas"
                or (not _forced_proj and jax.default_backend() == "tpu"
                    and hh * ww >= _FM_MIN_TOKENS)):
            # (force with DVDX_SPATIAL_PROJ_IMPL=pallas|xla for A/Bs and CPU
            # tests; auto-gated to XL-class folds — see _FM_MIN_TOKENS.)
            # Run proj_in/out as the 1x1 convs they are in diffusers
            # (use_linear_projection=False): on TPU the Dense form lowers via
            # an EmitInputBatchInLanes conv emitter whose token-minor input
            # layout forces a full-tensor f32 relayout of the GN output —
            # ~0.94 ms per call at XL, 54 ms/step total (round-4 HLO dump).
            # As a real NHWC 1x1 conv the GN apply fuses into the conv and
            # the stream keeps the spatial-conv layout. Same params (the
            # (C, C) Dense tree; kernels reshaped at trace time), same math.
            w_in, b_in = _DenseParams(c, name="proj_in")(c)
            dn = ("NHWC", "HWIO", "NHWC")
            h = jax.lax.conv_general_dilated(
                h.astype(self.dtype), w_in.astype(self.dtype)[None, None],
                (1, 1), "VALID", dimension_numbers=dn) + b_in.astype(self.dtype)
            h = h.reshape(n, hh * ww, c)
            for i in range(self.depth):
                h = BasicTransformerBlock(
                    c, self.num_heads, self.head_dim, self.cross_attention_dim,
                    dtype=self.dtype, name=f"block{i}",
                )(h, context)
            w_out, b_out = _DenseParams(c, name="proj_out_zero",
                                        kernel_init=nn.initializers.zeros)(c)
            h = jax.lax.conv_general_dilated(
                h.reshape(n, hh, ww, c), w_out.astype(self.dtype)[None, None],
                (1, 1), "VALID", dimension_numbers=dn) + b_out.astype(self.dtype)
            return residual + h
        h = h.reshape(n, hh * ww, c)
        h = nn.Dense(c, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                c, self.num_heads, self.head_dim, self.cross_attention_dim,
                dtype=self.dtype, name=f"block{i}",
            )(h, context)
        h = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="proj_out_zero")(h)
        return residual + h.reshape(n, hh, ww, c)


def rotary_embed(x: jax.Array, positions: jax.Array) -> jax.Array:
    """Rotary position embedding over the sequence axis.
    x: (B, S, H, D), positions: (S,). TPU-first addition for temporal attention
    (the reference's temporal transformer has no positional signal)."""
    d = x.shape[-1]
    half = d // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[:, None] * freqs[None, :]  # (S, half)
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


class TemporalAttention(nn.Module):
    """Self-attention over the frame axis at every spatial location.

    x: (B, F, H, W, C); frame_positions: (F,) absolute frame indices — under
    frame-chunked execution each chunk passes its true global positions so
    rotary phases match the unchunked model. Residual, zero-init out."""

    num_heads: int
    head_dim: int
    use_rotary: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, frame_positions: Optional[jax.Array] = None) -> jax.Array:
        b, f, hh, ww, c = x.shape
        residual = x
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        # (B*H*W, F, C): frame axis is the sequence
        h = h.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, f, c)
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(h)
        q = q.reshape(-1, f, self.num_heads, self.head_dim)
        k = k.reshape(-1, f, self.num_heads, self.head_dim)
        v = v.reshape(-1, f, self.num_heads, self.head_dim)
        if self.use_rotary:
            pos = frame_positions if frame_positions is not None else jnp.arange(f)
            q = rotary_embed(q, pos)
            k = rotary_embed(k, pos)
        # 'ring' engages ring attention when the frame axis is sharded
        # (exact context parallelism); otherwise falls through to auto
        o = multi_head_attention(q, k, v, impl="ring")
        o = o.reshape(-1, f, inner)
        o = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="to_out_zero")(o)
        o = o.reshape(b, hh, ww, f, c).transpose(0, 3, 1, 2, 4)
        return residual + o


class _FrameAxisAttention(nn.Module):
    """Attention over the FRAME axis of (B, F, N, C) without re-laying the
    tensor out — einsum keeps N (spatial positions) as a dot_general batch
    dim. Profiling showed the (B,F,H,W,C)->(B*H*W,F,C) transposes of the
    naive layout cost ~14% of the UNet step (docs/PERF_NOTES.md); this is
    the same math with zero materialised transposes. Param tree identical to
    `Attention` (to_q/to_k/to_v/to_out), so converted checkpoints load 1:1."""

    num_heads: int
    head_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    # position-major mode: x arrives as (B, N, F, C) — the parent hoisted ONE
    # HBM relayout per temporal module so the kernel's packed-row regroup is
    # a free view (the frame-major kernel's per-program in-VMEM swapaxes ran
    # 5-7x above the HBM floor at XL; docs/PERF_NOTES.md round-3b profile).
    # Never combined with ring/cp execution (the parent checks ring_active).
    posmajor: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, f, n, _ = x.shape
        inner = self.num_heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        if self.posmajor:
            from ..ops.pallas.temporal_attention import \
                temporal_attention_posmajor

            # here (b, f, n) unpacked above are really (b, n, f)
            o = temporal_attention_posmajor(q, k, v, heads=self.num_heads)
            return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out")(o)
        if not ring_active():
            from ..ops.pallas.temporal_attention import (choose_blocking,
                                                         choose_blocking_fm,
                                                         temporal_attention,
                                                         temporal_attention_fm)

            impl = _kernel_impl("DVDX_TEMPORAL_ATTN_IMPL")
            if (impl == "pallas"
                    and choose_blocking_fm(f, inner, self.num_heads)[0] > 0
                    and self.head_dim <= 128 and n >= 64):
                # checkerboard-packed MXU kernel consuming the NATIVE
                # (B, F, N, H*D) layout: no HBM logits, no relayouts on
                # EITHER side. Reached when the parent declined the posmajor
                # hoist — XL-class folds (the hoist transposes cost
                # 95-101 ms/step there) or posmajor-illegal F. At standard
                # folds the parent prefers posmajor (fm measured +3 ms/step
                # of new layout-crossing copies; docs/PERF_NOTES.md round 4).
                o = temporal_attention_fm(q, k, v, heads=self.num_heads)
                return nn.Dense(self.out_dim, dtype=self.dtype,
                                name="to_out")(o)
            if (impl == "pallas_fm"
                    and choose_blocking(f, inner, self.num_heads)[0] > 0
                    and self.head_dim <= 128 and n >= 64):
                # packed block-diagonal MXU kernel (in-VMEM repack variant,
                # kept for A/B: DVDX_TEMPORAL_ATTN_IMPL=pallas_fm)
                o = temporal_attention(q, k, v, heads=self.num_heads)
                return nn.Dense(self.out_dim, dtype=self.dtype,
                                name="to_out")(o)
        q = q.reshape(b, f, n, self.num_heads, self.head_dim)
        k = k.reshape(b, f, n, self.num_heads, self.head_dim)
        v = v.reshape(b, f, n, self.num_heads, self.head_dim)
        if ring_active():
            # exact-CP (cp_exact strategy): re-lay out to (B*N, F, H, D) and
            # run ring attention over the sharded frame axis — without this
            # the einsum below forces GSPMD to all-gather K/V over frames,
            # losing the memory scaling the strategy exists for. Only taken
            # inside parallel.strategies' ring_context; the single-device
            # step program (the PoI identity) never traces through it.
            def to_ring(t):
                return jnp.swapaxes(t, 1, 2).reshape(
                    b * n, f, self.num_heads, self.head_dim)

            o = multi_head_attention(to_ring(q), to_ring(k), to_ring(v),
                                     impl="ring")
            o = jnp.swapaxes(o.reshape(b, n, f, inner), 1, 2)
        else:
            logits = jnp.einsum("bfnhd,bgnhd->bnhfg", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits * (self.head_dim**-0.5)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            o = jnp.einsum("bnhfg,bgnhd->bfnhd", probs, v,
                           preferred_element_type=jnp.float32)
            o = o.astype(self.dtype).reshape(b, f, n, inner)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="to_out")(o.astype(self.dtype))


class _LNParams(nn.Module):
    """nn.LayerNorm's parameter tree (scale ones, bias zeros, f32) without
    its compute — for kernels that fuse the norm."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return s, b


class _AttnParams(nn.Module):
    """Attention/_FrameAxisAttention's parameter tree (to_q/to_k/to_v
    kernel-only, to_out kernel+bias) without its compute. kv_features
    covers cross-attention (to_k/to_v project from the context dim)."""

    inner: int
    out_dim: int

    @nn.compact
    def __call__(self, in_features: int, kv_features: Optional[int] = None):
        kvf = in_features if kv_features is None else kv_features
        q, _ = _DenseParams(self.inner, use_bias=False, name="to_q")(in_features)
        k, _ = _DenseParams(self.inner, use_bias=False, name="to_k")(kvf)
        v, _ = _DenseParams(self.inner, use_bias=False, name="to_v")(kvf)
        ow, ob = _DenseParams(self.out_dim, name="to_out")(self.inner)
        return q, k, v, ow, ob


class _FFParams(nn.Module):
    """GEGLUFeedForward's parameter tree (proj_in/proj_out kernel+bias,
    mult=4) without its compute."""

    dim: int

    @nn.compact
    def __call__(self):
        inner = self.dim * 4
        wi, bi = _DenseParams(inner * 2, name="proj_in")(self.dim)
        wo, bo = _DenseParams(self.dim, name="proj_out")(inner)
        return wi, bi, wo, bo


def _fused_block_wants(f: int, n: int, dim: int, heads: int) -> bool:
    """True when _TemporalBlock should run as ONE pallas kernel
    (ops/pallas/temporal_block) — TPU, frame-major, resident-weight bound.
    Env DVDX_TEMPORAL_BLOCK_IMPL: 'pallas' forces, 'xla' disables."""
    import os

    if ring_active():
        return False
    forced = os.environ.get("DVDX_TEMPORAL_BLOCK_IMPL", "")
    if forced:
        if forced != "pallas":
            return False
    elif (n < 64 or jax.default_backend() != "tpu"
          or os.environ.get("DVDX_TEMPORAL_ATTN_IMPL", "")):
        # an explicit temporal-attn override selects that unfused path
        return False
    from ..ops.pallas.temporal_block import choose_blocking_block

    return choose_blocking_block(f, dim, heads)[0] > 0


class _TemporalBlock(nn.Module):
    """BasicTransformerBlock semantics on (B, F, N, C) with frame-axis
    attention (attn1 AND attn2 — diffusers double_self_attention). Same
    submodule names as BasicTransformerBlock -> same checkpoint mapping."""

    dim: int
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5
    posmajor: bool = False   # x is (B, N, F, C); LN/FF are last-axis anyway

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if (not self.posmajor
                and _fused_block_wants(x.shape[1], x.shape[2], self.dim,
                                       self.num_heads)):
            # whole-block pallas kernel: x streams HBM->VMEM once, every
            # weight resident, LN stats in registers, packed checkerboard
            # attention — the unfused stream's per-op costs (LN stats
            # passes, token-minor projection matmuls, launch overheads)
            # were 23 ms/step at the standard geometry's level 0 alone
            # (docs/PERF_NOTES.md round 4). Param tree identical to the
            # unfused branch below — checkpoints are branch-agnostic.
            from ..ops.pallas.temporal_block import fused_temporal_block

            inner = self.dim * 4
            ln1 = _LNParams(self.dim, name="norm1")()
            ln2 = _LNParams(self.dim, name="norm2")()
            ln3 = _LNParams(self.dim, name="norm3")()
            a1 = _AttnParams(self.num_heads * self.head_dim, self.dim,
                             name="attn1")(self.dim)
            a2 = _AttnParams(self.num_heads * self.head_dim, self.dim,
                             name="attn2")(self.dim)
            ff = _FFParams(self.dim, name="ff")()
            params = {
                "ln1_s": ln1[0], "ln1_b": ln1[1],
                "q1": a1[0], "k1": a1[1], "v1": a1[2],
                "o1_w": a1[3], "o1_b": a1[4],
                "ln2_s": ln2[0], "ln2_b": ln2[1],
                "q2": a2[0], "k2": a2[1], "v2": a2[2],
                "o2_w": a2[3], "o2_b": a2[4],
                "ln3_s": ln3[0], "ln3_b": ln3[1],
                "ffi_w": ff[0], "ffi_b": ff[1],
                "ffo_w": ff[2], "ffo_b": ff[3],
            }
            return fused_temporal_block(x.astype(self.dtype), params,
                                        heads=self.num_heads, eps=self.eps)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        x = x + _FrameAxisAttention(self.num_heads, self.head_dim, self.dim,
                                    dtype=self.dtype, posmajor=self.posmajor,
                                    name="attn1")(h)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm2")(x)
        x = x + _FrameAxisAttention(self.num_heads, self.head_dim, self.dim,
                                    dtype=self.dtype, posmajor=self.posmajor,
                                    name="attn2")(h)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm3")(x)
        x = x + GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class TransformerTemporal(nn.Module):
    """Temporal transformer over the frame axis, matching diffusers
    TransformerTemporalModel (the module the reference's UNet3D uses for
    transformer_in and every temp_attention,
    `/root/reference/InferNet/neurons/miner.py:83-87` via diffusers):

      GroupNorm(32, eps=1e-6) with statistics over (F, H, W) jointly ->
      (B*H*W, F, C) -> Linear proj_in -> BasicTransformerBlock (self-attn,
      [cross-dim attn2 self-attending], GEGLU FF) -> Linear proj_out ->
      + residual.

    No positional signal (the pretrained family is trained that way). The
    global-over-frames GroupNorm means frame-sharded (CP) execution of THIS
    style needs replicated frames or a stats reduction; the TPU-first
    TemporalAttention (rotary, LayerNorm) remains the shard-native style.
    proj_out is zero-init at random init (identity start, golden-testable);
    pretrained weights overwrite it."""

    num_heads: int
    head_dim: int
    cross_attention_dim: Optional[int] = None
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 frame_positions: Optional[jax.Array] = None) -> jax.Array:
        b, f, hh, ww, c = x.shape
        residual = x
        # flax GroupNorm on (B, F, H, W, C) reduces over every non-batch axis
        # per channel group == diffusers' norm of (B, C, F, H, W)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        # native-layout path: (B, F, N, C) with frame-axis attention — zero
        # per-op transposes (the naive (B*H*W, F, C) relayout cost ~14% of
        # the step; see docs/PERF_NOTES.md). Same math, same param names.
        h = h.reshape(b, f, hh * ww, c)
        # position-major hoist: ONE XLA relayout here (and one back) lets the
        # packed temporal-attention kernel consume (B, N, F, HD) blocks whose
        # packed-row regroup is a free view — removing the per-program VMEM
        # swapaxes that kept the frame-major kernel 5-7x above its HBM floor
        # (round-3b XL profile). LN/Dense/GEGLU between the transposes are
        # last-axis ops, so the whole block runs position-major.
        pm = self._use_posmajor(f, hh * ww, c)
        if pm:
            h = jnp.swapaxes(h, 1, 2)
        if not pm and self._proj_as_conv(f, hh * ww):
            # XL-class folds: proj_in/out as NHWC 1x1 convs over the
            # (B*F, H, W, C) view — the Dense form lowers through a
            # token-minor conv emitter that relays the full tensor around
            # each projection (same pathology as SpatialTransformer's
            # proj_in; see that branch). Same params, same math.
            w_in, b_in = _DenseParams(c, name="proj_in")(c)
            dn = ("NHWC", "HWIO", "NHWC")
            h4 = h.reshape(b * f, hh, ww, c)
            h4 = jax.lax.conv_general_dilated(
                h4.astype(self.dtype), w_in.astype(self.dtype)[None, None],
                (1, 1), "VALID", dimension_numbers=dn) + b_in.astype(self.dtype)
            h = _TemporalBlock(c, self.num_heads, self.head_dim,
                               dtype=self.dtype, posmajor=False,
                               name="block0")(h4.reshape(b, f, hh * ww, c))
            w_out, b_out = _DenseParams(c, name="proj_out_zero",
                                        kernel_init=nn.initializers.zeros)(c)
            h4 = jax.lax.conv_general_dilated(
                h.reshape(b * f, hh, ww, c),
                w_out.astype(self.dtype)[None, None],
                (1, 1), "VALID", dimension_numbers=dn) + b_out.astype(self.dtype)
            return residual + h4.reshape(b, f, hh, ww, c)
        h = nn.Dense(c, dtype=self.dtype, name="proj_in")(h)
        h = _TemporalBlock(c, self.num_heads, self.head_dim,
                           dtype=self.dtype, posmajor=pm, name="block0")(h)
        h = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                     name="proj_out_zero")(h)
        if pm:
            h = jnp.swapaxes(h, 1, 2)
        h = h.reshape(b, f, hh, ww, c)
        return residual + h

    def _proj_as_conv(self, f: int, n: int) -> bool:
        # TPU default wherever the posmajor hoist is off (fused-block or fm
        # rows): measured -1.8 ms/step at std on top of the fused block and
        # part of the -130 ms/step XL total (docs/PERF_NOTES.md round 4b)
        import os

        forced = os.environ.get("DVDX_TEMPORAL_PROJ_IMPL", "")
        if forced:
            return forced == "pallas"
        return jax.default_backend() == "tpu"

    def _use_posmajor(self, f: int, n: int, c: int) -> bool:
        """Hoist to position-major (one transpose pair per module feeding the
        posmajor kernel) — the measured-best layout at STANDARD-class folds.
        At XL-class folds (n >= _FM_MIN_TOKENS) the hoist transposes cost
        95-101 ms/step, so the parent declines and _FrameAxisAttention runs
        the frame-major checkerboard kernel instead (-50 ms/step measured).
        The fused whole-block kernel (frame-major) preempts both.
        Env: 'posmajor' forces the hoist at any size, 'pallas' forces the
        fm kernel (no hoist); auto ('') applies the gate."""
        if ring_active() or self.head_dim > 128 or n < 64:
            return False
        if _fused_block_wants(f, n, c, self.num_heads):
            return False
        import os

        forced = os.environ.get("DVDX_TEMPORAL_ATTN_IMPL", "")
        if forced and forced != "posmajor":
            return False
        if not forced and (jax.default_backend() != "tpu"
                           or _wants_fm_layout(f, n)):
            return False
        from ..ops.pallas.temporal_attention import choose_blocking_posmajor

        return choose_blocking_posmajor(
            f, self.num_heads * self.head_dim, self.num_heads)[0] > 0


class Downsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv")(x)
