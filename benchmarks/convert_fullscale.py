"""Full-scale pretrained-ingestion proof (VERDICT r2 item 3).

The reference actually loads the 1.4B cerspense Zeroscope checkpoint
(`/root/reference/InferNet/neurons/miner.py:83-123`); our converter was only
torch-parity-tested at tiny configs. This script proves the ingestion path at
the REAL Zeroscope 576w geometry without any egress:

1. synthesize a diffusers-layout checkpoint ON DISK at full scale
   (UNet3DConditionModel keys via tests/torch_ref — the torch semantics twin
   the converter is parity-tested against — block_out_channels
   (320,640,1280,1280), layers_per_block 2, cross_dim 1024; CLIP ViT-H text
   tower 1024x23; AutoencoderKL 128x(1,2,4,4); random values);
2. convert + load it (utils.convert.load_diffusers_checkpoint — the strict
   mapper that errors on any unconsumed/missing key);
3. run a 2-step 8f@256x256 generation on the available backend;
4. report timings, parameter counts, peak host RSS, and the program's static
   HBM reservation.

Usage:  python benchmarks/convert_fullscale.py [--ckpt-dir DIR] [--cpu]
        [--keep] (keep the ~6.5 GB synthetic checkpoint for reuse)
Prints one JSON line; see docs/FULLSCALE_INGEST.md for a recorded run.
"""

import argparse
import json
import os
import resource
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FULL_UNET = dict(in_channels=4, out_channels=4,
                 block_out_channels=(320, 640, 1280, 1280),
                 layers_per_block=2, cross_levels=(True, True, True, False),
                 head_dim=64, cross_dim=1024, groups=32, n_temp_convs=4)
FULL_VAE = dict(latent_ch=4, block_out_channels=(128, 256, 512, 512),
                layers_per_block=2, groups=32, mid_attention=True)


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def synthesize_checkpoint(root: str) -> float:
    """Write the diffusers-layout checkpoint; returns seconds. Idempotent."""
    if os.path.exists(os.path.join(root, "model_index.json")):
        return 0.0
    import torch
    from safetensors.numpy import save_file
    from transformers import CLIPTextConfig, CLIPTextModel

    from tests.torch_ref import AutoencoderKLRef, UNet3DConditionModelRef

    t0 = time.time()
    os.makedirs(root, exist_ok=True)

    def sd_numpy(module):
        return {k: v.detach().cpu().numpy()
                for k, v in module.state_dict().items()}

    def put(sub, sd, cfg, weight_name="diffusion_pytorch_model.safetensors"):
        os.makedirs(f"{root}/{sub}", exist_ok=True)
        save_file(sd, f"{root}/{sub}/{weight_name}")
        with open(f"{root}/{sub}/config.json", "w") as f:
            json.dump(cfg, f)

    torch.manual_seed(0)
    with torch.no_grad():
        unet = UNet3DConditionModelRef(**FULL_UNET)
        for p in unet.parameters():   # small-scale values keep bf16 finite
            p.mul_(0.02)
    put("unet", sd_numpy(unet), {
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [320, 640, 1280, 1280], "layers_per_block": 2,
        "attention_head_dim": 64, "cross_attention_dim": 1024,
        "norm_num_groups": 32, "norm_eps": 1e-5,
        "down_block_types": ["CrossAttnDownBlock3D", "CrossAttnDownBlock3D",
                             "CrossAttnDownBlock3D", "DownBlock3D"],
    })
    del unet

    # The VAE decoder keeps torch's default init: GroupNorm between convs
    # bounds activations (bf16-finite), and decoding the denoised latents
    # then yields TEXTURED, frame-varying output — the 0.02-scaled variant
    # produced a near-constant gray video that the validator's authenticity
    # check (scoring/mdvqs.py:109) correctly rejected as degenerate, which
    # would block the full PoI round this checkpoint exists to drive.
    with torch.no_grad():
        vae = AutoencoderKLRef(**FULL_VAE)
    put("vae", sd_numpy(vae), {
        "latent_channels": 4, "block_out_channels": [128, 256, 512, 512],
        "layers_per_block": 2, "norm_num_groups": 32,
        "scaling_factor": 0.18215,
    })
    del vae

    text_cfg = CLIPTextConfig(
        vocab_size=49408, hidden_size=1024, intermediate_size=4096,
        num_hidden_layers=23, num_attention_heads=16,
        max_position_embeddings=77, hidden_act="gelu",
        bos_token_id=49406, eos_token_id=49407, pad_token_id=49407)
    with torch.no_grad():
        text = CLIPTextModel(text_cfg).eval()
    put("text_encoder", sd_numpy(text), text_cfg.to_dict(),
        weight_name="model.safetensors")
    del text

    with open(f"{root}/model_index.json", "w") as f:
        json.dump({"_class_name": "TextToVideoSDPipeline",
                   "note": "synthetic full-scale geometry (random values)"}, f)
    return time.time() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default=os.path.expanduser(
        "~/.cache/dvdx_tpu/synthetic_zs576w"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache_tpu" if not args.cpu
                                   else ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = {"geometry": "zeroscope-576w (320,640,1280,1280)x2, xattn 1024"}
    out["synthesize_s"] = round(synthesize_checkpoint(args.ckpt_dir), 1)
    out["checkpoint_gb"] = round(sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(args.ckpt_dir) for f in fs) / 2**30, 2)

    from dvdx_tpu.pipelines.text2video import generate, resolve_pipeline
    from dvdx_tpu.utils.init import param_count

    t0 = time.time()
    pipe = resolve_pipeline(args.ckpt_dir)   # converts + device-puts
    out["convert_load_s"] = round(time.time() - t0, 1)
    out["unet_params"] = param_count(pipe.params["unet"])
    out["text_params"] = param_count(pipe.params["text"])
    out["vae_dec_params"] = param_count(pipe.params["vae_dec"])
    assert out["unet_params"] > 1_300_000_000, "not full scale"
    out["rss_gb_after_load"] = round(_rss_gb(), 2)

    t0 = time.time()
    video = generate(pipe, "a red panda climbing a tree", seed=3,
                     num_frames=args.frames, height=args.size,
                     width=args.size, num_steps=args.steps)
    out["generate_compile_plus_run_s"] = round(time.time() - t0, 1)
    out["video_shape"] = list(video.shape)
    import numpy as np

    out["video_finite"] = bool(np.isfinite(video.astype(np.float32)).all())
    fn, _ = pipe.generator(args.frames, args.size, args.size, args.steps,
                           guidance_scale=pipe.spec.default_guidance_scale,
                           context_weight=0.0, record=False)
    try:
        ma = fn.lower(pipe.params,
                      __import__("jax.numpy", fromlist=["asarray"]).asarray(
                          pipe.tokenize(["", "a red panda"])),
                      __import__("dvdx_tpu.ops.rng",
                                 fromlist=["base_key"]).base_key(3)
                      ).compile().memory_analysis()
        out["static_hbm_gb"] = round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes
             - getattr(ma, "alias_size_in_bytes", 0)) / 2**30, 2)
    except Exception as e:
        out["static_hbm_gb_error"] = str(e)[:120]
    out["peak_rss_gb"] = round(_rss_gb(), 2)

    if not args.keep:
        shutil.rmtree(args.ckpt_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
