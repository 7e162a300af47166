"""Video Diffusion Transformer (CogVideoX-class family).

BASELINE.json config 4 targets a CogVideoX-5B-class DiT with
sequence-parallel latents. Architecture (capability match, TPU-first):
* 3D patch embedding (t x h x w patches -> tokens), channel-last;
* joint sequence [text tokens ; video tokens] with full self-attention
  (CogVideoX-style "expert" transformer without separate cross-attn);
* 3D rotary position embedding on video tokens (absolute frame positions so
  frame-chunked/sequence-parallel shards agree with the global model);
* adaLN-zero timestep modulation (zero-init gates: identity at init, same
  golden-test property as the UNet family);
* exposes the SAME call signature as UNet3D
  (params, latents (B,F,H,W,C), timesteps, encoder_hidden_states,
  frame_positions) so every pipeline/strategy/PoI path applies unchanged.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from .layers import TimeEmbedding, timestep_embedding


@dataclasses.dataclass(frozen=True)
class DiTVideoConfig:
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 3072
    num_layers: int = 42
    num_heads: int = 48
    patch_size: Tuple[int, int, int] = (1, 2, 2)   # (t, h, w)
    text_hidden_size: int = 4096
    mlp_ratio: float = 4.0
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def tiny_dit_config() -> DiTVideoConfig:
    return DiTVideoConfig(in_channels=4, out_channels=4, hidden_size=64,
                          num_layers=2, num_heads=4, patch_size=(1, 2, 2),
                          text_hidden_size=64, dtype="float32")


def _rope_3d(positions_f, positions_h, positions_w, dim: int):
    """3D rotary phase tables. Each axis gets dim//3 (rounded to even) dims."""
    def phases(pos, d):
        freqs = jnp.exp(-math.log(10000.0) *
                        jnp.arange(d // 2, dtype=jnp.float32) / (d // 2))
        ang = pos.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.cos(ang), jnp.sin(ang)

    d_f = (dim // 3) // 2 * 2
    d_h = (dim // 3) // 2 * 2
    d_w = dim - d_f - d_h
    cf, sf = phases(positions_f, d_f)
    ch, sh = phases(positions_h, d_h)
    cw, sw = phases(positions_w, d_w)
    cos = jnp.concatenate([cf, ch, cw], axis=-1)  # (S, dim/2)
    sin = jnp.concatenate([sf, sh, sw], axis=-1)
    return cos, sin


def _apply_rope(x, cos, sin):
    """x: (B, S, H, D); cos/sin: (S, D/2)."""
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1).astype(x.dtype)


class _DiTBlock(nn.Module):
    cfg: DiTVideoConfig

    @nn.compact
    def __call__(self, x, temb, rope, n_text):
        cfg = self.cfg
        dt = cfg.compute_dtype
        hs = cfg.hidden_size
        # adaLN-zero: 6 modulation vectors from the time embedding
        mods = nn.Dense(6 * hs, dtype=dt, kernel_init=nn.initializers.zeros,
                        name="adaln_zero")(nn.silu(temb))  # (B, 6H)
        shift_a, scale_a, gate_a, shift_m, scale_m, gate_m = jnp.split(
            mods[:, None, :], 6, axis=-1)

        h = nn.LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="ln1")(x)
        h = h * (1 + scale_a) + shift_a
        b, s, _ = h.shape
        q = nn.Dense(hs, dtype=dt, name="to_q")(h).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = nn.Dense(hs, dtype=dt, name="to_k")(h).reshape(b, s, cfg.num_heads, cfg.head_dim)
        v = nn.Dense(hs, dtype=dt, name="to_v")(h).reshape(b, s, cfg.num_heads, cfg.head_dim)
        cos, sin = rope
        # rotate video tokens only; text tokens keep identity phase
        q_vid = _apply_rope(q[:, n_text:], cos, sin)
        k_vid = _apply_rope(k[:, n_text:], cos, sin)
        q = jnp.concatenate([q[:, :n_text], q_vid], axis=1)
        k = jnp.concatenate([k[:, :n_text], k_vid], axis=1)
        o = multi_head_attention(q, k, v).reshape(b, s, hs)
        o = nn.Dense(hs, dtype=dt, name="to_out")(o)
        x = x + gate_a * o

        h = nn.LayerNorm(use_scale=False, use_bias=False, dtype=dt, name="ln2")(x)
        h = h * (1 + scale_m) + shift_m
        inner = int(hs * cfg.mlp_ratio)
        h = nn.Dense(inner, dtype=dt, name="fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(hs, dtype=dt, name="fc2")(h)
        return x + gate_m * h


class VideoDiT(nn.Module):
    """Same interface as UNet3D: (latents, timesteps, encoder_hidden_states,
    frame_positions) -> prediction, shape == latents."""

    cfg: DiTVideoConfig

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
        b, f, h, w, cin = latents.shape
        pt, ph, pw = cfg.patch_size
        assert f % pt == 0 and h % ph == 0 and w % pw == 0, "patch misalignment"
        nf, nh, nw = f // pt, h // ph, w // pw
        if frame_positions is None:
            frame_positions = jnp.arange(f)

        # 3D patch embed: (B, nf, nh, nw, pt*ph*pw*C) -> tokens
        x = latents.astype(dt).reshape(b, nf, pt, nh, ph, nw, pw, cin)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, nf * nh * nw, pt * ph * pw * cin)
        x = nn.Dense(cfg.hidden_size, dtype=dt, name="patch_embed")(x)

        # text tokens into the joint sequence
        txt = nn.Dense(cfg.hidden_size, dtype=dt, name="text_proj")(
            encoder_hidden_states.astype(dt))
        n_text = txt.shape[1]
        x = jnp.concatenate([txt, x], axis=1)

        temb = timestep_embedding(timesteps, cfg.hidden_size)
        temb = TimeEmbedding(cfg.hidden_size, dt, name="time_embedding")(temb)

        # 3D rotary tables over (frame, row, col) patch coordinates
        patch_frames = frame_positions.reshape(nf, pt)[:, 0]
        pf = jnp.repeat(patch_frames, nh * nw)
        phh = jnp.tile(jnp.repeat(jnp.arange(nh), nw), nf)
        pww = jnp.tile(jnp.arange(nw), nf * nh)
        rope = _rope_3d(pf, phh, pww, cfg.head_dim)

        for i in range(cfg.num_layers):
            x = _DiTBlock(cfg, name=f"block{i}")(x, temb, rope, n_text)

        x = x[:, n_text:]
        x = nn.LayerNorm(dtype=dt, name="final_ln")(x)
        x = nn.Dense(pt * ph * pw * cfg.out_channels, dtype=dt,
                     kernel_init=nn.initializers.zeros, name="proj_out_zero")(x)
        x = x.reshape(b, nf, nh, nw, pt, ph, pw, cfg.out_channels)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, f, h, w, cfg.out_channels)
        return x.astype(latents.dtype)


def init_dit_params(cfg: DiTVideoConfig, seed: int = 0, frames: int = 2,
                    size: Tuple[int, int] = (16, 16), **init_kwargs):
    from ..utils.init import fast_init

    model = VideoDiT(cfg)
    lat = jnp.zeros((1, frames, size[0], size[1], cfg.in_channels), cfg.compute_dtype)
    ts = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 8, cfg.text_hidden_size), cfg.compute_dtype)
    return fast_init(model, seed, lat, ts, ctx, **init_kwargs)
