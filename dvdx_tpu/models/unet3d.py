"""Zeroscope-class conditional UNet3D, TPU-first.

Capability match for the diffusers ``UNet3DConditionModel`` the reference loads
(`/root/reference/Distribution/strategies/fsdp.py:55-62`,
`/root/reference/InferNet/neurons/miner.py:83-87`): per-frame spatial resnets +
spatial transformers with CLIP cross-attention, temporal convolutions and
temporal self-attention interleaved at every level, sinusoidal time embedding,
classifier-free-guidance-ready (batch dim carries [uncond, cond]).

TPU-first redesign choices (NOT a translation):
* layout (B, F, H, W, C) channel-last; spatial ops fold frames into batch
  ((B*F, H, W, C)) so every conv/matmul is one big MXU-friendly batch. Under
  exact CP the fold flips to frames-major (F*B) so the frame sharding stays
  GSPMD-expressible (ops/layout.py).
* static shapes, pure apply; the denoise loop is `lax.scan`-able.
* rotary temporal positions so frame-chunked shards see absolute positions.
* all temporal mixers zero-init => identity at init (golden-testable).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.layout import fold_frames, per_frame, unfold_frames
from .layers import (
    Downsample2D,
    ResnetBlock2D,
    SpatialTransformer,
    TemporalAttention,
    TemporalConvBlock,
    TimeEmbedding,
    TransformerTemporal,
    Upsample2D,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # which levels get spatial cross-attn transformers (last level is plain)
    cross_attention_levels: Tuple[bool, ...] = (True, True, True, False)
    attention_head_dim: int = 64
    cross_attention_dim: int = 1024
    norm_groups: int = 32
    norm_eps: float = 1e-5
    # diffusers TemporalConvLayer has 4 convs (conv1..conv4)
    temporal_conv_layers: int = 4
    use_temporal_attention: bool = True
    use_rotary_time: bool = True
    # 'diffusers': TransformerTemporalModel semantics (GN over frames,
    #   proj_in/out, GEGLU FF, no positions) — loads pretrained weights 1:1.
    # 'rotary': TPU-first shard-native mixer (LayerNorm, rotary frame
    #   positions, no FF) — exact frame-sharded CP, but no pretrained path.
    temporal_style: str = "diffusers"
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


def tiny_unet_config() -> UNet3DConfig:
    """CPU-test-scale config (used by the golden tests and the mock network).
    Keeps the rotary temporal style: the CP-exact/ring-attention test paths
    exercise shard-native temporal mixing."""
    return UNet3DConfig(
        block_out_channels=(32, 64),
        layers_per_block=1,
        cross_attention_levels=(True, False),
        attention_head_dim=16,
        cross_attention_dim=64,
        norm_groups=8,
        temporal_conv_layers=1,
        temporal_style="rotary",
        dtype="float32",
    )


def tiny_hf_unet_config() -> UNet3DConfig:
    """CPU-test-scale config in the diffusers-faithful style (converter and
    parity tests; same block semantics as the full zeroscope spec)."""
    return UNet3DConfig(
        block_out_channels=(32, 64),
        layers_per_block=1,
        cross_attention_levels=(True, False),
        attention_head_dim=16,
        cross_attention_dim=64,
        norm_groups=8,
        temporal_conv_layers=4,
        temporal_style="diffusers",
        dtype="float32",
    )


def _temporal_mixer(cfg: UNet3DConfig, channels: int, name: str,
                    with_cross_dim: bool = True):
    """Temporal attention module for the configured style (see UNet3DConfig)."""
    dt = cfg.compute_dtype
    heads = max(1, channels // cfg.attention_head_dim)
    if cfg.temporal_style == "diffusers":
        return TransformerTemporal(
            heads, cfg.attention_head_dim,
            cross_attention_dim=cfg.cross_attention_dim if with_cross_dim else None,
            groups=cfg.norm_groups, dtype=dt, name=name)
    return TemporalAttention(heads, cfg.attention_head_dim,
                             cfg.use_rotary_time, dt, name=name)


class _LevelBlock(nn.Module):
    """One (resnet, temporal-conv, [spatial-xattn, temporal-attn]) unit —
    the per-layer sequence of diffusers CrossAttnDown/Up/MidBlock3D."""

    cfg: UNet3DConfig
    out_channels: int
    has_attention: bool

    @nn.compact
    def __call__(self, x, temb_pf, context_pf, frame_positions):
        # x: (B, F, H, W, C)
        cfg = self.cfg
        dt = cfg.compute_dtype
        b, f = x.shape[0], x.shape[1]
        xs = fold_frames(x)
        xs = ResnetBlock2D(self.out_channels, cfg.norm_groups, dt,
                           eps=cfg.norm_eps, name="resnet")(xs, temb_pf)
        x = unfold_frames(xs, b, f)
        x = TemporalConvBlock(self.out_channels, cfg.temporal_conv_layers, cfg.norm_groups,
                              dt, eps=cfg.norm_eps, name="temp_conv")(x)
        if self.has_attention:
            heads = max(1, self.out_channels // cfg.attention_head_dim)
            xs = fold_frames(x)
            xs = SpatialTransformer(heads, cfg.attention_head_dim, cfg.cross_attention_dim,
                                    groups=cfg.norm_groups, dtype=dt, name="spatial_attn")(xs, context_pf)
            x = unfold_frames(xs, b, f)
            if cfg.use_temporal_attention:
                x = _temporal_mixer(cfg, self.out_channels,
                                    "temporal_attn")(x, frame_positions)
        return x


class UNet3D(nn.Module):
    """Video denoiser. Inputs:
      latents: (B, F, H, W, in_channels)
      timesteps: (B,) int32 training-timestep indices
      encoder_hidden_states: (B, T_text, cross_attention_dim)
      frame_positions: (F,) absolute frame indices (default arange(F))
    Returns eps prediction, same shape as latents."""

    cfg: UNet3DConfig

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        frame_positions: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        b, f, h, w, _ = latents.shape
        if frame_positions is None:
            frame_positions = jnp.arange(f)

        ch0 = cfg.block_out_channels[0]
        temb = timestep_embedding(timesteps, ch0)
        temb = TimeEmbedding(ch0 * 4, dt, name="time_embedding")(temb)
        # per-frame broadcast of time embedding and text context, in the
        # active spatial fold order (ops/layout.py)
        temb_pf = per_frame(temb, f)  # (B*F or F*B, D)
        context = encoder_hidden_states.astype(dt)
        context_pf = per_frame(context, f)  # (B*F or F*B, T, Dx)

        x = latents.astype(dt)
        xs = fold_frames(x)
        xs = nn.Conv(ch0, (3, 3), padding="SAME", dtype=dt, name="conv_in")(xs)
        x = unfold_frames(xs, b, f)

        # transformer_in: temporal attention right after conv_in. In the
        # diffusers UNet3D this is TransformerTemporalModel(heads=8,
        # head_dim=ch0//8, no cross dim) — head geometry differs from the
        # in-block temp_attentions, so build it explicitly.
        if cfg.use_temporal_attention:
            if cfg.temporal_style == "diffusers":
                x = TransformerTemporal(8, max(1, ch0 // 8),
                                        cross_attention_dim=None,
                                        groups=cfg.norm_groups, dtype=dt,
                                        name="transformer_in")(x, frame_positions)
            else:
                x = TemporalAttention(max(1, ch0 // cfg.attention_head_dim),
                                      cfg.attention_head_dim,
                                      cfg.use_rotary_time, dt,
                                      name="transformer_in")(x, frame_positions)

        num_levels = len(cfg.block_out_channels)
        skips = [x]
        # --- down path ---
        for level, out_ch in enumerate(cfg.block_out_channels):
            for blk in range(cfg.layers_per_block):
                x = _LevelBlock(cfg, out_ch, cfg.cross_attention_levels[level],
                                name=f"down_{level}_{blk}")(x, temb_pf, context_pf, frame_positions)
                skips.append(x)
            if level < num_levels - 1:
                xs = fold_frames(x)
                xs = Downsample2D(out_ch, dt, name=f"down_{level}_downsample")(xs)
                x = unfold_frames(xs, b, f)
                skips.append(x)

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        x = _LevelBlock(cfg, mid_ch, True, name="mid_0")(x, temb_pf, context_pf, frame_positions)
        x = _LevelBlock(cfg, mid_ch, False, name="mid_1")(x, temb_pf, context_pf, frame_positions)

        # --- up path ---
        for level in reversed(range(num_levels)):
            out_ch = cfg.block_out_channels[level]
            for blk in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = _LevelBlock(cfg, out_ch, cfg.cross_attention_levels[level],
                                name=f"up_{level}_{blk}")(x, temb_pf, context_pf, frame_positions)
            if level > 0:
                xs = fold_frames(x)
                xs = Upsample2D(out_ch, dt, name=f"up_{level}_upsample")(xs)
                x = unfold_frames(xs, b, f)

        assert not skips
        xs = fold_frames(x)
        xs = nn.GroupNorm(num_groups=cfg.norm_groups, epsilon=cfg.norm_eps,
                          dtype=dt, name="conv_norm_out")(xs)
        xs = nn.silu(xs)
        xs = nn.Conv(cfg.out_channels, (3, 3), padding="SAME", dtype=dt,
                     kernel_init=nn.initializers.zeros, name="conv_out_zero")(xs)
        return unfold_frames(xs, b, f).astype(latents.dtype)


def init_unet_params(cfg: UNet3DConfig, seed: int = 0, frames: int = 2,
                     size: Tuple[int, int] = (16, 16), **init_kwargs):
    """Initialise parameters host-side (fast, deterministic across hosts).
    init_kwargs forward to utils.init.fast_init (dtype / device_put)."""
    from ..utils.init import fast_init

    model = UNet3D(cfg)
    lat = jnp.zeros((1, frames, size[0], size[1], cfg.in_channels), cfg.compute_dtype)
    ts = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 8, cfg.cross_attention_dim), cfg.compute_dtype)
    return fast_init(model, seed, lat, ts, ctx, **init_kwargs)
