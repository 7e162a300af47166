"""VAE (AutoencoderKL-class) encoder/decoder, channel-last, per-frame.

Capability match for the diffusers VAE the reference uses: per-frame decode to
bound memory (`/root/reference/Distribution/strategies/fsdp.py:165-179`), 8x
spatial down/up factor, 4 latent channels, scaling factor 0.18215.

TPU-first: decode is expressed per-frame and spatially tileable so the frame
axis can stay sharded across the mesh through decode (the reference must funnel
everything through rank 0 or run the decode as an FSDP collective,
`fsdp_chunked.py:223,248-262`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention

SCALING_FACTOR = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    base_channels: int = 128
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    layers_per_block: int = 2
    norm_groups: int = 32
    use_mid_attention: bool = True
    # diffusers AutoencoderKL has no output nonlinearity (the pipeline clamps
    # after scaling); tanh is this framework's bounded-output default for
    # random-init models. Pretrained loads set final_tanh=False for parity.
    final_tanh: bool = True
    scaling_factor: float = SCALING_FACTOR
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.channel_mults) - 1)


def tiny_vae_config() -> VAEConfig:
    return VAEConfig(base_channels=16, channel_mults=(1, 2), layers_per_block=1,
                     norm_groups=4, use_mid_attention=False, dtype="float32")


class _VAEResnet(nn.Module):
    out_channels: int
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        r = x
        h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(h)
        if r.shape[-1] != self.out_channels:
            r = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="shortcut")(r)
        return r + h


class _VAEAttention(nn.Module):
    groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        r = x
        y = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, name="norm")(x)
        y = y.reshape(n, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="v")(y)
        o = multi_head_attention(q[:, :, None], k[:, :, None], v[:, :, None])[:, :, 0]
        o = nn.Dense(c, dtype=self.dtype, name="proj")(o)
        return r + o.reshape(n, h, w, c)


class VAEDecoder(nn.Module):
    """(N, h, w, latent_channels) scaled latents -> (N, H, W, 3) in [-1, 1]."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dt = cfg.compute_dtype
        z = (z / cfg.scaling_factor).astype(dt)
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=dt, name="post_quant_conv")(z)
        ch = cfg.base_channels * cfg.channel_mults[-1]
        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=dt, name="conv_in")(z)
        h = _VAEResnet(ch, cfg.norm_groups, dt, name="mid_res1")(h)
        if cfg.use_mid_attention:
            h = _VAEAttention(cfg.norm_groups, dt, name="mid_attn")(h)
        h = _VAEResnet(ch, cfg.norm_groups, dt, name="mid_res2")(h)
        for i, mult in reversed(list(enumerate(cfg.channel_mults))):
            out_ch = cfg.base_channels * mult
            for j in range(cfg.layers_per_block + 1):
                h = _VAEResnet(out_ch, cfg.norm_groups, dt, name=f"up_{i}_{j}")(h)
            if i > 0:
                n, hh, ww, c = h.shape
                h = jax.image.resize(h, (n, hh * 2, ww * 2, c), method="nearest")
                h = nn.Conv(c, (3, 3), padding="SAME", dtype=dt, name=f"up_{i}_conv")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_groups, dtype=dt, name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(3, (3, 3), padding="SAME", dtype=dt, name="conv_out")(h)
        h = h.astype(jnp.float32)
        return jnp.tanh(h) if cfg.final_tanh else h


class VAEEncoder(nn.Module):
    """(N, H, W, 3) -> latent mean (N, h, w, latent_channels), pre-scaling.
    (Needed for img2vid conditioning — SVD family — and round-trip tests.)"""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.compute_dtype
        h = nn.Conv(cfg.base_channels, (3, 3), padding="SAME", dtype=dt, name="conv_in")(x.astype(dt))
        for i, mult in enumerate(cfg.channel_mults):
            out_ch = cfg.base_channels * mult
            for j in range(cfg.layers_per_block):
                h = _VAEResnet(out_ch, cfg.norm_groups, dt, name=f"down_{i}_{j}")(h)
            if i < len(cfg.channel_mults) - 1:
                h = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=dt, name=f"down_{i}_conv")(h)
        ch = cfg.base_channels * cfg.channel_mults[-1]
        h = _VAEResnet(ch, cfg.norm_groups, dt, name="mid_res1")(h)
        if cfg.use_mid_attention:
            h = _VAEAttention(cfg.norm_groups, dt, name="mid_attn")(h)
        h = _VAEResnet(ch, cfg.norm_groups, dt, name="mid_res2")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_groups, dtype=dt, name="norm_out")(h)
        h = nn.silu(h)
        mean = nn.Conv(cfg.latent_channels, (3, 3), padding="SAME", dtype=dt, name="conv_mean")(h)
        return mean.astype(jnp.float32) * cfg.scaling_factor


def _tile_starts(size: int, tile: int, stride: int):
    """Static tile start offsets covering [0, size) with the final tile
    right-aligned (every pixel covered, constant tile shape for XLA)."""
    starts = list(range(0, max(size - tile, 0) + 1, stride))
    if not starts or starts[-1] + tile < size:
        starts.append(size - tile)
    return sorted(set(max(0, s) for s in starts))


def _blend_weight_1d(size: int, start: int, total: int, overlap: int):
    """Linear ramp into/out of the overlapped borders (partition of unity
    when tiles are laid out by _tile_starts with stride = tile - overlap)."""
    import numpy as np

    w = np.ones(size, np.float32)
    if start > 0 and overlap > 0:
        w[:overlap] = (np.arange(overlap) + 1) / (overlap + 1)
    if start + size < total and overlap > 0:
        w[-overlap:] = np.minimum(w[-overlap:],
                                  ((np.arange(overlap) + 1) / (overlap + 1))[::-1])
    return w


def decode_frame_spatially_tiled(decoder_apply, params, z_frame,
                                 tile: int = 48, overlap: int = 8,
                                 upscale: int = 8):
    """Decode one latent frame (h, w, C) in overlapping spatial tiles with
    linear seam blending — bounds decode peak memory by TILE area instead of
    frame area (the XL 576x1024 memory wall; the reference's answer is
    per-frame decode only, `fsdp.py:165-179` — this goes one axis further,
    like diffusers' enable_vae_tiling). Approximate at seams (the decoder's
    GroupNorms see per-tile statistics); a single covering tile is exact.
    """
    h, w, c = z_frame.shape
    tile_h, tile_w = min(tile, h), min(tile, w)
    stride_h, stride_w = tile_h - overlap, tile_w - overlap
    hs = _tile_starts(h, tile_h, max(1, stride_h))
    ws = _tile_starts(w, tile_w, max(1, stride_w))
    if len(hs) == 1 and len(ws) == 1:
        return decoder_apply(params, z_frame[None])[0]

    H, W = h * upscale, w * upscale
    out = jnp.zeros((H, W, 3), jnp.float32)
    norm = jnp.zeros((H, W, 1), jnp.float32)
    for sh in hs:
        for sw in ws:
            zt = jax.lax.dynamic_slice(z_frame, (sh, sw, 0), (tile_h, tile_w, c))
            img = decoder_apply(params, zt[None])[0]        # (tile*8, tile*8, 3)
            wh = _blend_weight_1d(tile_h * upscale, sh * upscale, H,
                                  overlap * upscale)
            ww = _blend_weight_1d(tile_w * upscale, sw * upscale, W,
                                  overlap * upscale)
            mask = jnp.asarray(wh[:, None] * ww[None, :])[..., None]
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(out, (sh * upscale, sw * upscale, 0),
                                           (tile_h * upscale, tile_w * upscale, 3))
                + img.astype(jnp.float32) * mask,
                (sh * upscale, sw * upscale, 0))
            norm = jax.lax.dynamic_update_slice(
                norm, jax.lax.dynamic_slice(norm, (sh * upscale, sw * upscale, 0),
                                            (tile_h * upscale, tile_w * upscale, 1))
                + mask,
                (sh * upscale, sw * upscale, 0))
    return out / jnp.maximum(norm, 1e-6)


def decode_frames_tiled(decoder_apply, params, latents, tile: int = 0,
                        overlap: int = 8, upscale: int = 8):
    """Decode (F, h, w, C) latents frame-by-frame with optional spatial tiling.

    Mirrors the reference's per-frame decode loop (`fsdp.py:165-179`) but as a
    scan over frames so peak memory is one frame's activations. tile>0
    additionally tiles each frame spatially (decode_frame_spatially_tiled) —
    peak memory becomes one TILE's activations (XL headroom); tile=0 keeps
    exact full-frame decode (single-frame activations fit at 576x320).
    """
    def one(carry, z):
        if tile:
            img = decode_frame_spatially_tiled(decoder_apply, params, z,
                                               tile=tile, overlap=overlap,
                                               upscale=upscale)
        else:
            img = decoder_apply(params, z[None])[0]
        return carry, img

    _, frames = jax.lax.scan(one, None, latents)
    return frames
