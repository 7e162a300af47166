"""Image -> video pipeline (SVD-class img2vid family).

BASELINE.json config 3: Stable-Video-Diffusion-style conditioning — the input
image is VAE-encoded and its latent is concatenated to every frame's noise
latent on the channel axis (in_channels = 2 x latent_channels), and the image
drives the conditioning stream (here through the shared cross-attention
interface: the encoded image embedding replaces text tokens). Same denoise /
strategy / PoI machinery as text2video; only input assembly differs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dit_video import VideoDiT, init_dit_params
from ..models.text_encoder import CLIPTextEncoder, init_text_params, tokenize_batch
from ..models.unet3d import UNet3D, init_unet_params
from ..models.vae import VAEDecoder, VAEEncoder, decode_frames_tiled
from ..models.zoo import ModelSpec, get_model_spec
from ..ops import rng as rng_ops
from ..ops.scheduler import make_ddim_schedule
from ..pipelines.text2video import Pipeline, build_pipeline, denoise


@dataclasses.dataclass
class Img2VideoPipeline:
    base: Pipeline
    vae_encoder: VAEEncoder
    _cache: Dict[tuple, Any] = dataclasses.field(default_factory=dict)


def build_img2video_pipeline(model_name: str = "svd-tiny", seed: int = 0
                             ) -> Img2VideoPipeline:
    from ..utils.init import fast_init

    base = build_pipeline(model_name, seed=seed)
    if base.spec.conditioning != "image":
        raise ValueError(f"{model_name} is not an image-conditioned family")
    enc = VAEEncoder(base.spec.vae)
    size = 16
    base.params["vae_enc"] = fast_init(enc, seed + 3,
                                       jnp.zeros((1, size, size, 3), jnp.float32))
    return Img2VideoPipeline(base=base, vae_encoder=enc)


def generate_from_image(
    pipe: Img2VideoPipeline,
    image: np.ndarray,             # (H, W, 3) uint8 conditioning frame
    *,
    seed: int = 0,
    num_frames: Optional[int] = None,
    num_steps: Optional[int] = None,
    guidance_scale: Optional[float] = None,
    cond_aug: float = 0.02,        # SVD conditioning-noise augmentation
    record: bool = False,
):
    """Returns uint8 (F, H, W, 3) video animating the conditioning image."""
    base = pipe.base
    spec = base.spec
    num_frames = num_frames or spec.default_frames
    num_steps = num_steps or spec.default_steps
    if guidance_scale is None:
        guidance_scale = spec.default_guidance_scale
    height, width = image.shape[0], image.shape[1]
    ds = spec.vae.downscale
    lh, lw = height // ds, width // ds
    c = spec.latent_channels

    key = (num_frames, height, width, num_steps, float(guidance_scale),
           float(cond_aug), bool(record))
    if key not in pipe._cache:
        sched = make_ddim_schedule(num_steps, prediction_type=spec.prediction_type)

        def core(params, img_f32, noise_key):
            # conditioning latent from the input frame (+ noise augmentation)
            cond_lat = pipe.vae_encoder.apply(params["vae_enc"], img_f32[None])[0]
            aug = rng_ops.aux_noise(noise_key, cond_lat, tag=7)
            cond_lat = cond_lat + cond_aug * aug
            cond_pf = jnp.broadcast_to(cond_lat[None, None],
                                       (1, num_frames, lh, lw, c))

            # conditioning stream: pooled image latent as a 1-token context
            tok = cond_lat.reshape(1, lh * lw, c)
            ctx_dim = (spec.unet.cross_attention_dim if spec.kind == "unet3d"
                       else spec.dit.text_hidden_size)
            pad = jnp.zeros((1, 1, ctx_dim), cond_lat.dtype)
            pooled = jnp.mean(tok, axis=1, keepdims=True)  # (1,1,C)
            ctx_tok = pad.at[..., : pooled.shape[-1]].set(pooled)
            uncond = jnp.zeros_like(ctx_tok)

            z0 = rng_ops.video_noise(noise_key, num_frames, (lh, lw, c), jnp.float32)
            z0 = z0[None].astype(jnp.bfloat16)

            def unet_concat(p, x, ts, ctx, pos=None):
                # channel-concat conditioning (SVD UNet in_channels = 2c)
                b = x.shape[0]
                cp = jnp.broadcast_to(cond_pf.astype(x.dtype), (b,) + cond_pf.shape[1:])
                return base.unet.apply(p, jnp.concatenate([x, cp], axis=-1),
                                       ts, ctx, pos)

            out = denoise(unet_concat, params["unet"], sched, z0, ctx_tok,
                          uncond, guidance_scale, record=record)
            if record:
                zf, zs, epss = out
            else:
                zf = out
            frames = decode_frames_tiled(base.vae_decoder.apply,
                                         params["vae_dec"],
                                         zf[0].astype(jnp.float32))
            return (frames, zs, epss) if record else frames

        pipe._cache[key] = (jax.jit(core), sched)

    fn, sched = pipe._cache[key]
    img_f32 = jnp.asarray(image, jnp.float32) / 127.5 - 1.0
    out = fn(base.params, img_f32, rng_ops.base_key(seed))
    if record:
        frames, zs, epss = out
    else:
        frames = out
    video = np.asarray(((frames + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8))
    if record:
        return video, (np.asarray(zs), np.asarray(epss), np.asarray(sched.timesteps))
    return video
