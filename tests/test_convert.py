"""Pretrained-weight ingestion parity (VERDICT r1 item 1).

The converter (utils/convert.py) is validated output-for-output against torch
references with diffusers state-dict layouts:

* CLIP text tower — against transformers' REAL CLIPTextModel;
* UNet3DConditionModel / AutoencoderKL — against tests/torch_ref.py (the
  diffusers semantics re-written in torch, since diffusers itself is not
  installed offline);
* full checkpoint-directory load — a fake diffusers checkpoint (configs +
  safetensors + tokenizer files) assembled on disk, loaded end-to-end into a
  generating Pipeline.
"""

import json
import os

import numpy as np
import pytest
import torch

from dvdx_tpu.models.text_encoder import CLIPTextEncoder, TextEncoderConfig
from dvdx_tpu.models.unet3d import UNet3D, tiny_hf_unet_config
from dvdx_tpu.models.vae import VAEConfig, VAEDecoder, VAEEncoder
from dvdx_tpu.utils.convert import (convert_text_encoder, convert_unet3d,
                                    convert_vae_decoder, convert_vae_encoder)

torch.manual_seed(0)


def _sd_numpy(module: torch.nn.Module):
    return {k: v.detach().float().numpy() for k, v in module.state_dict().items()}


def _randomize(module: torch.nn.Module, scale=0.05, seed=0):
    """Fill every parameter with small random values (activates zero-init
    temporal paths so parity is meaningful)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    return module


# --- CLIP text tower vs real transformers --------------------------------------


@pytest.fixture(scope="module")
def clip_pair():
    from transformers import CLIPTextConfig, CLIPTextModel

    hf_cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="gelu",
        bos_token_id=0, eos_token_id=98, pad_token_id=1)
    # eos_token_id != 2 deliberately: HF CLIPTextModel keeps a legacy
    # argmax(ids) pooling path when eos_token_id == 2 (correct only for the
    # real vocab where EOS is the max id); with any other eos it pools at the
    # first EOS — the semantic our encoder implements for every vocab.
    model = CLIPTextModel(hf_cfg).eval()
    ours_cfg = TextEncoderConfig(
        vocab_size=99, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_length=16, hidden_act="gelu",
        layer_norm_eps=hf_cfg.layer_norm_eps, eos_token_id=98, dtype="float32")
    params = convert_text_encoder(_sd_numpy(model), ours_cfg)
    return model, ours_cfg, params


def test_clip_text_parity(clip_pair):
    import jax

    model, cfg, params = clip_pair
    ids = np.array([[0, 5, 9, 42, 98, 1, 1, 1],
                    [0, 7, 98, 1, 1, 1, 1, 1]], np.int32)
    with torch.no_grad():
        out = model(torch.from_numpy(ids.astype(np.int64)))
    ours_hidden, ours_pooled = jax.jit(CLIPTextEncoder(cfg).apply)(params, ids)
    np.testing.assert_allclose(np.asarray(ours_hidden),
                               out.last_hidden_state.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_pooled),
                               out.pooler_output.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_clip_text_quick_gelu_parity():
    import jax
    from transformers import CLIPTextConfig, CLIPTextModel

    hf_cfg = CLIPTextConfig(
        vocab_size=50, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2,
        max_position_embeddings=12, hidden_act="quick_gelu",
        bos_token_id=0, eos_token_id=49, pad_token_id=1)
    model = CLIPTextModel(hf_cfg).eval()
    cfg = TextEncoderConfig(vocab_size=50, hidden_size=16, num_layers=1,
                            num_heads=2, intermediate_size=32, max_length=12,
                            hidden_act="quick_gelu", eos_token_id=49,
                            dtype="float32")
    params = convert_text_encoder(_sd_numpy(model), cfg)
    ids = np.array([[0, 4, 8, 49, 1, 1]], np.int32)
    with torch.no_grad():
        want = model(torch.from_numpy(ids.astype(np.int64))).last_hidden_state
    got, _ = jax.jit(CLIPTextEncoder(cfg).apply)(params, ids)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5,
                               rtol=1e-4)


# --- UNet3D full-model parity ---------------------------------------------------


def test_unet3d_full_parity():
    import jax
    from tests.torch_ref import UNet3DConditionModelRef

    ref = _randomize(UNet3DConditionModelRef(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_levels=(True, False), head_dim=16, cross_dim=64, groups=8,
        n_temp_convs=4).eval(), seed=3)
    cfg = tiny_hf_unet_config()
    params = convert_unet3d(_sd_numpy(ref), cfg)

    rng = np.random.default_rng(0)
    lat = rng.normal(0, 1, (1, 3, 8, 8, 4)).astype(np.float32)   # (B,F,H,W,C)
    ehs = rng.normal(0, 1, (1, 5, 64)).astype(np.float32)
    ts = np.array([7], np.int32)

    with torch.no_grad():
        want = ref(torch.from_numpy(lat.transpose(0, 4, 1, 2, 3)),
                   torch.from_numpy(ts), torch.from_numpy(ehs))
    got = jax.jit(UNet3D(cfg).apply)(params, lat, ts, ehs)
    got_t = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got_t, want.numpy(), atol=5e-4, rtol=1e-3)


def test_unet3d_converter_is_strict():
    from tests.torch_ref import UNet3DConditionModelRef

    ref = UNet3DConditionModelRef(block_out_channels=(32, 64),
                                  layers_per_block=1,
                                  cross_levels=(True, False), head_dim=16,
                                  cross_dim=64, groups=8, n_temp_convs=4)
    sd = _sd_numpy(ref)
    sd["down_blocks.0.bogus.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unconverted"):
        convert_unet3d(sd, tiny_hf_unet_config())
    sd.pop("down_blocks.0.bogus.weight")
    sd.pop("conv_in.weight")
    with pytest.raises(KeyError, match="conv_in"):
        convert_unet3d(sd, tiny_hf_unet_config())


# --- VAE parity -----------------------------------------------------------------


@pytest.fixture(scope="module")
def vae_pair():
    from tests.torch_ref import AutoencoderKLRef

    ref = _randomize(AutoencoderKLRef(latent_ch=4, block_out_channels=(16, 32),
                                      layers_per_block=1, groups=4,
                                      mid_attention=True).eval(), seed=5)
    cfg = VAEConfig(latent_channels=4, base_channels=16, channel_mults=(1, 2),
                    layers_per_block=1, norm_groups=4, use_mid_attention=True,
                    final_tanh=False, dtype="float32")
    return ref, cfg


def test_vae_decoder_parity(vae_pair):
    import jax

    ref, cfg = vae_pair
    params = convert_vae_decoder(_sd_numpy(ref), cfg)
    rng = np.random.default_rng(1)
    z = rng.normal(0, 1, (2, 4, 4, 4)).astype(np.float32)        # (N,h,w,C)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(z.transpose(0, 3, 1, 2)))
    # our decoder takes SCALED latents and divides by scaling_factor
    got = jax.jit(VAEDecoder(cfg).apply)(params, z * cfg.scaling_factor)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want.numpy(), atol=5e-4, rtol=1e-3)


def test_vae_encoder_parity_with_quant_fold(vae_pair):
    import jax

    ref, cfg = vae_pair
    params = convert_vae_encoder(_sd_numpy(ref), cfg)
    rng = np.random.default_rng(2)
    x = rng.normal(0, 0.5, (1, 8, 8, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref.encode_mean(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = jax.jit(VAEEncoder(cfg).apply)(params, x) / cfg.scaling_factor
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want.numpy(), atol=5e-4, rtol=1e-3)


# --- full checkpoint directory load ---------------------------------------------


@pytest.fixture(scope="module")
def fake_checkpoint(tmp_path_factory):
    """Assemble a diffusers-layout checkpoint directory on disk."""
    from safetensors.numpy import save_file
    from transformers import CLIPTextConfig, CLIPTextModel

    from dvdx_tpu.models.tokenizer import build_test_vocab, write_tokenizer_files
    from tests.torch_ref import AutoencoderKLRef, UNet3DConditionModelRef

    root = str(tmp_path_factory.mktemp("ckpt"))

    def put(sub, sd, cfg, weight_name="diffusion_pytorch_model.safetensors"):
        os.makedirs(f"{root}/{sub}", exist_ok=True)
        save_file(sd, f"{root}/{sub}/{weight_name}")
        with open(f"{root}/{sub}/config.json", "w") as f:
            json.dump(cfg, f)

    unet = _randomize(UNet3DConditionModelRef(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_levels=(True, False), head_dim=16, cross_dim=64, groups=8,
        n_temp_convs=4), seed=11)
    put("unet", _sd_numpy(unet), {
        "in_channels": 4, "out_channels": 4, "block_out_channels": [32, 64],
        "layers_per_block": 1, "attention_head_dim": 16,
        "cross_attention_dim": 64, "norm_num_groups": 8, "norm_eps": 1e-5,
        "down_block_types": ["CrossAttnDownBlock3D", "DownBlock3D"],
    })
    vae = _randomize(AutoencoderKLRef(latent_ch=4, block_out_channels=(16, 32),
                                      layers_per_block=1, groups=4,
                                      mid_attention=True), seed=12)
    put("vae", _sd_numpy(vae), {
        "latent_channels": 4, "block_out_channels": [16, 32],
        "layers_per_block": 1, "norm_num_groups": 4,
        "scaling_factor": 0.18215,
    })
    vocab, merges = build_test_vocab(
        ["a", "red", "panda", "tree", "video", "of", "the"])
    write_tokenizer_files(f"{root}/tokenizer", vocab, merges)
    V = len(vocab)  # BOS = V-2, EOS = V-1 (build_test_vocab appends them last)
    text_cfg = CLIPTextConfig(
        vocab_size=V, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="gelu",
        bos_token_id=V - 2, eos_token_id=V - 1, pad_token_id=V - 1)
    text = CLIPTextModel(text_cfg).eval()
    put("text_encoder", _sd_numpy(text), text_cfg.to_dict(),
        weight_name="model.safetensors")
    with open(f"{root}/model_index.json", "w") as f:
        json.dump({"_class_name": "TextToVideoSDPipeline"}, f)
    return root


def test_load_diffusers_checkpoint_generates(fake_checkpoint):
    from dvdx_tpu.pipelines.text2video import generate
    from dvdx_tpu.utils.convert import load_diffusers_checkpoint

    pipe = load_diffusers_checkpoint(fake_checkpoint, dtype="float32")
    assert pipe.tokenizer is not None
    assert pipe.spec.text.eos_token_id == pipe.tokenizer.eos_id
    assert pipe.spec.vae.final_tanh is False
    ids = pipe.tokenize(["a red panda"])
    assert ids[0, 0] == pipe.tokenizer.bos_id
    video = generate(pipe, "a red panda in a tree", seed=3, num_frames=2,
                     height=16, width=16, num_steps=2)
    assert video.shape == (2, 16, 16, 3) and video.dtype == np.uint8
    assert np.isfinite(video.astype(np.float32)).all()
    # deterministic reload: same bytes from a fresh load
    pipe2 = load_diffusers_checkpoint(fake_checkpoint, dtype="float32")
    video2 = generate(pipe2, "a red panda in a tree", seed=3, num_frames=2,
                      height=16, width=16, num_steps=2)
    np.testing.assert_array_equal(video, video2)
