"""Model family registry.

The reference pins one family — Zeroscope v2 (576w) and v2-XL, both the
ModelScope UNet3D architecture (`/root/reference/Distribution/download_model.py`,
`InferNet/neurons/miner.py:83-87`). This registry reproduces those at full
scale plus a CPU-test-scale variant; further families (SVD img2vid,
CogVideoX-class DiT) land behind the same interface.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

from .text_encoder import TextEncoderConfig, tiny_text_config
from .unet3d import UNet3DConfig, tiny_unet_config
from .vae import VAEConfig, tiny_vae_config


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    unet: UNet3DConfig
    text: TextEncoderConfig
    vae: VAEConfig
    # native generation geometry (pixels / frames the family was designed for)
    default_width: int = 576
    default_height: int = 320
    default_frames: int = 16
    default_steps: int = 25
    default_guidance_scale: float = 7.5


_FULL_UNET = UNet3DConfig()  # (320, 640, 1280, 1280), x-attn 1024 — Zeroscope class
_FULL_TEXT = TextEncoderConfig()  # ViT-H text tower scale
_FULL_VAE = VAEConfig()

REGISTRY: Dict[str, ModelSpec] = {
    "zeroscope-tiny": ModelSpec(
        name="zeroscope-tiny",
        unet=tiny_unet_config(),
        text=tiny_text_config(),
        vae=tiny_vae_config(),
        default_width=32,
        default_height=32,
        default_frames=4,
        default_steps=4,
        default_guidance_scale=7.5,
    ),
    "zeroscope-v2-576w": ModelSpec(
        name="zeroscope-v2-576w",
        unet=_FULL_UNET,
        text=_FULL_TEXT,
        vae=_FULL_VAE,
        default_width=576,
        default_height=320,
        default_frames=16,
        default_steps=25,
    ),
    "zeroscope-v2-xl": ModelSpec(
        name="zeroscope-v2-xl",
        unet=_FULL_UNET,
        text=_FULL_TEXT,
        vae=_FULL_VAE,
        default_width=1024,
        default_height=576,
        default_frames=24,
        default_steps=50,
    ),
}


def get_model_spec(name: str) -> ModelSpec:
    if name not in REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(REGISTRY)}")
    return REGISTRY[name]
