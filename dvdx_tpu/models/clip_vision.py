"""CLIP-style vision transformer for quality scoring.

The reference scores videos with openai/clip-vit-base-patch32 frame embeddings
(`/root/reference/InferNet/template/validator/scoring.py:69-151`). No egress
in this runtime, so the tower is the same architecture, deterministically
initialised — miner and validator derive identical weights from the seed, so
scores are reproducible across the network (which is what the protocol needs;
absolute score quality improves when real weights are loaded via orbax).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    projection_dim: int = 512
    # HF CLIPVisionModel parity knobs (openai ViT-B/32: quick_gelu, eps 1e-5);
    # defaults keep the deterministic random-init tower bit-stable
    hidden_act: str = "gelu_tanh"
    layer_norm_eps: float = 1e-6
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


def tiny_vision_config() -> VisionConfig:
    return VisionConfig(image_size=32, patch_size=8, hidden_size=64,
                        num_layers=2, num_heads=4, intermediate_size=128,
                        projection_dim=32)


class _ViTBlock(nn.Module):
    cfg: VisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.compute_dtype
        hd = cfg.hidden_size // cfg.num_heads
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt, name="ln1")(x)
        b, s, _ = h.shape
        q = nn.Dense(cfg.hidden_size, dtype=dt, name="q")(h).reshape(b, s, cfg.num_heads, hd)
        k = nn.Dense(cfg.hidden_size, dtype=dt, name="k")(h).reshape(b, s, cfg.num_heads, hd)
        v = nn.Dense(cfg.hidden_size, dtype=dt, name="v")(h).reshape(b, s, cfg.num_heads, hd)
        o = multi_head_attention(q, k, v).reshape(b, s, cfg.hidden_size)
        x = x + nn.Dense(cfg.hidden_size, dtype=dt, name="proj")(o)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt, name="ln2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=dt, name="fc1")(h)
        from .text_encoder import _activation

        h = _activation(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=dt, name="fc2")(h)
        return x + h


class CLIPVisionEncoder(nn.Module):
    """images (B, H, W, 3) in [-1,1] -> projected embedding (B, projection_dim)."""

    cfg: VisionConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        b = images.shape[0]
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    use_bias=False, dtype=dt, name="patch_embed")(images.astype(dt))
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, cfg.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(dt), (b, 1, cfg.hidden_size)), x], axis=1)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (1, x.shape[1], cfg.hidden_size))
        x = x + pos.astype(dt)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt, name="pre_ln")(x)
        for i in range(cfg.num_layers):
            x = _ViTBlock(cfg, name=f"layer{i}")(x)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                              name="post_ln")(x[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=dt,
                        name="visual_projection")(pooled)
