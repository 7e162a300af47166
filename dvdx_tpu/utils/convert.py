"""Diffusers/safetensors checkpoint -> dvdx_tpu parameter trees.

The reference runs pretrained Zeroscope weights fetched from HuggingFace
(`/root/reference/Distribution/strategies/fsdp.py:55-62`,
`/root/reference/Distribution/download_model.py:17-94`,
`/root/reference/InferNet/neurons/miner.py:83-123`). This module is the
TPU-native ingestion path: it reads a diffusers-layout checkpoint directory

    root/
      model_index.json
      unet/config.json + diffusion_pytorch_model.safetensors (UNet3DConditionModel)
      vae/config.json + diffusion_pytorch_model.safetensors (AutoencoderKL)
      text_encoder/config.json + model.safetensors (CLIPTextModel)
      tokenizer/vocab.json + merges.txt (CLIPTokenizer)

and produces the channel-last Flax parameter trees of models/{unet3d,vae,
text_encoder}.py, with every torch->flax layout transpose (OIHW->HWIO convs,
(kt,1,1) temporal convs, Linear transposes, 1x1-conv-as-Dense folds) and the
full name mapping. Per-module and full-model output parity against torch
references is asserted in tests/test_convert.py (tests/torch_ref.py carries
the torch-side semantics; transformers' real CLIPTextModel anchors the text
tower).

Zero-egress note: nothing here downloads — `fetch_checkpoint`
(utils/checkpoint.py) or any out-of-band copy supplies the directory.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models.text_encoder import TextEncoderConfig
from ..models.unet3d import UNet3DConfig
from ..models.vae import VAEConfig


# --- state-dict loading ------------------------------------------------------

_WEIGHT_FILES = (
    "diffusion_pytorch_model.safetensors",
    "model.safetensors",
    "diffusion_pytorch_model.bin",
    "pytorch_model.bin",
)


def load_state_dict(component_dir: str) -> Dict[str, np.ndarray]:
    """Load a component's torch state dict as float32 numpy (safetensors
    preferred; .bin via torch.load). fp16/bf16 tensors are upcast — the
    pipeline casts to its storage dtype after conversion."""
    path = None
    for name in _WEIGHT_FILES:
        cand = os.path.join(component_dir, name)
        if os.path.exists(cand):
            path = cand
            break
    if path is None:
        raise FileNotFoundError(f"no weight file in {component_dir!r} "
                                f"(looked for {_WEIGHT_FILES})")
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out: Dict[str, np.ndarray] = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                try:
                    out[k] = np.asarray(f.get_tensor(k), dtype=np.float32)
                except (TypeError, ValueError):
                    # bf16 needs the torch bridge
                    import torch
                    from safetensors.torch import load_file

                    return {k2: v2.detach().to(torch.float32).numpy()
                            for k2, v2 in load_file(path).items()}
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().to(torch.float32).numpy() for k, v in sd.items()}


def _read_config(component_dir: str) -> dict:
    with open(os.path.join(component_dir, "config.json")) as f:
        return json.load(f)


# --- transposes --------------------------------------------------------------


def t_conv2d(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def t_conv3d(w: np.ndarray) -> np.ndarray:
    """(O, I, kt, kh, kw) -> (kt, kh, kw, I, O)."""
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


def t_linear(w: np.ndarray) -> np.ndarray:
    """(O, I) -> (I, O)."""
    return np.ascontiguousarray(w.T)


def t_linear_or_conv1x1(w: np.ndarray) -> np.ndarray:
    """diffusers proj_in/proj_out may be Linear (O,I) or Conv2d-1x1
    (O,I,1,1); both are Dense math."""
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return t_linear(w)


class _Mapper:
    """Accumulates 'our/flax/path' -> array, consuming diffusers keys; tracks
    usage so conversion is strict (typos in either tree fail loudly)."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = sd
        self.used = set()
        self.flat: Dict[str, np.ndarray] = {}

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"missing checkpoint key {key!r}")
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def put(self, our_path: str, arr: np.ndarray):
        self.flat[our_path] = np.asarray(arr)

    # common composites ------------------------------------------------------

    def norm(self, ours: str, hf: str):
        """GroupNorm/LayerNorm: weight->scale, bias->bias."""
        self.put(f"{ours}/scale", self.take(f"{hf}.weight"))
        self.put(f"{ours}/bias", self.take(f"{hf}.bias"))

    def dense(self, ours: str, hf: str, bias: bool = True, conv1x1: bool = False):
        tf = t_linear_or_conv1x1 if conv1x1 else t_linear
        self.put(f"{ours}/kernel", tf(self.take(f"{hf}.weight")))
        if bias:
            self.put(f"{ours}/bias", self.take(f"{hf}.bias"))

    def conv2d(self, ours: str, hf: str):
        self.put(f"{ours}/kernel", t_conv2d(self.take(f"{hf}.weight")))
        self.put(f"{ours}/bias", self.take(f"{hf}.bias"))

    def conv3d(self, ours: str, hf: str):
        self.put(f"{ours}/kernel", t_conv3d(self.take(f"{hf}.weight")))
        self.put(f"{ours}/bias", self.take(f"{hf}.bias"))

    def unflatten(self) -> Dict[str, Any]:
        tree: Dict[str, Any] = {}
        for path, arr in self.flat.items():
            node = tree
            parts = path.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
        return tree

    def unused(self, ignore_prefixes: Tuple[str, ...] = ()) -> list:
        return sorted(
            k for k in self.sd
            if k not in self.used
            and not any(k.startswith(p) for p in ignore_prefixes)
        )


# --- shared sub-module maps --------------------------------------------------


def _map_attention(m: _Mapper, ours: str, hf: str):
    """diffusers Attention: to_q/k/v (no bias), to_out.0 (bias)."""
    m.dense(f"{ours}/to_q", f"{hf}.to_q", bias=False)
    m.dense(f"{ours}/to_k", f"{hf}.to_k", bias=False)
    m.dense(f"{ours}/to_v", f"{hf}.to_v", bias=False)
    m.dense(f"{ours}/to_out", f"{hf}.to_out.0")


def _map_basic_block(m: _Mapper, ours: str, hf: str, has_cross: bool):
    """diffusers BasicTransformerBlock -> layers.BasicTransformerBlock."""
    m.norm(f"{ours}/norm1", f"{hf}.norm1")
    _map_attention(m, f"{ours}/attn1", f"{hf}.attn1")
    if has_cross:
        m.norm(f"{ours}/norm2", f"{hf}.norm2")
        _map_attention(m, f"{ours}/attn2", f"{hf}.attn2")
    m.norm(f"{ours}/norm3", f"{hf}.norm3")
    m.dense(f"{ours}/ff/proj_in", f"{hf}.ff.net.0.proj")
    m.dense(f"{ours}/ff/proj_out", f"{hf}.ff.net.2")


def _map_spatial_transformer(m: _Mapper, ours: str, hf: str):
    """diffusers Transformer2DModel (1 block) -> layers.SpatialTransformer."""
    m.norm(f"{ours}/norm", f"{hf}.norm")
    m.dense(f"{ours}/proj_in", f"{hf}.proj_in", conv1x1=True)
    _map_basic_block(m, f"{ours}/block0", f"{hf}.transformer_blocks.0",
                     has_cross=True)
    m.dense(f"{ours}/proj_out_zero", f"{hf}.proj_out", conv1x1=True)


def _map_temporal_transformer(m: _Mapper, ours: str, hf: str):
    """diffusers TransformerTemporalModel -> layers.TransformerTemporal.
    double_self_attention=True -> attn2/norm2 always present."""
    m.norm(f"{ours}/norm", f"{hf}.norm")
    m.dense(f"{ours}/proj_in", f"{hf}.proj_in")
    _map_basic_block(m, f"{ours}/block0", f"{hf}.transformer_blocks.0",
                     has_cross=True)
    m.dense(f"{ours}/proj_out_zero", f"{hf}.proj_out")


def _map_resnet(m: _Mapper, ours: str, hf: str, time_emb: bool = True):
    m.norm(f"{ours}/norm1", f"{hf}.norm1")
    m.conv2d(f"{ours}/conv1", f"{hf}.conv1")
    if time_emb:
        m.dense(f"{ours}/time_emb_proj", f"{hf}.time_emb_proj")
    m.norm(f"{ours}/norm2", f"{hf}.norm2")
    m.conv2d(f"{ours}/conv2", f"{hf}.conv2")
    if m.has(f"{hf}.conv_shortcut.weight"):
        # 1x1 Conv in both trees (ours is nn.Conv (1,1))
        shortcut = "conv_shortcut" if time_emb else "shortcut"
        m.conv2d(f"{ours}/{shortcut}", f"{hf}.conv_shortcut")


def _map_temp_conv(m: _Mapper, ours: str, hf: str, num_layers: int):
    """diffusers TemporalConvLayer conv1..convN -> TemporalConvBlock
    norm{i}/conv{i}. Sequential indices: conv1 = (GN, SiLU, Conv) -> .2;
    conv2..4 = (GN, SiLU, Dropout, Conv) -> .3."""
    for i in range(num_layers):
        hf_seq = f"{hf}.conv{i + 1}"
        conv_idx = 2 if i == 0 else 3
        last = i == num_layers - 1
        m.norm(f"{ours}/norm{i}", f"{hf_seq}.0")
        name = f"conv{i}_zero" if last else f"conv{i}"
        m.conv3d(f"{ours}/{name}", f"{hf_seq}.{conv_idx}")


# --- UNet3D ------------------------------------------------------------------


def convert_unet3d(sd: Dict[str, np.ndarray], cfg: UNet3DConfig) -> Dict[str, Any]:
    """UNet3DConditionModel state dict -> {'params': ...} for models.unet3d.UNet3D.

    Requires cfg.temporal_style == 'diffusers' (the rotary style has no
    pretrained analog)."""
    if cfg.use_temporal_attention and cfg.temporal_style != "diffusers":
        raise ValueError("pretrained UNet3D weights need temporal_style="
                         "'diffusers' (rotary has no checkpoint analog)")
    m = _Mapper(sd)
    L = len(cfg.block_out_channels)

    m.conv2d("conv_in", "conv_in")
    m.dense("time_embedding/fc1", "time_embedding.linear_1")
    m.dense("time_embedding/fc2", "time_embedding.linear_2")
    if cfg.use_temporal_attention:
        _map_temporal_transformer(m, "transformer_in", "transformer_in")

    def map_level_block(ours: str, hf_block: str, j: int, has_attn: bool):
        _map_resnet(m, f"{ours}/resnet", f"{hf_block}.resnets.{j}")
        _map_temp_conv(m, f"{ours}/temp_conv", f"{hf_block}.temp_convs.{j}",
                       cfg.temporal_conv_layers)
        if has_attn:
            _map_spatial_transformer(m, f"{ours}/spatial_attn",
                                     f"{hf_block}.attentions.{j}")
            if cfg.use_temporal_attention:
                _map_temporal_transformer(m, f"{ours}/temporal_attn",
                                          f"{hf_block}.temp_attentions.{j}")

    # down path
    for level in range(L):
        has_attn = cfg.cross_attention_levels[level]
        for j in range(cfg.layers_per_block):
            map_level_block(f"down_{level}_{j}", f"down_blocks.{level}", j,
                            has_attn)
        if level < L - 1:
            m.conv2d(f"down_{level}_downsample/conv",
                     f"down_blocks.{level}.downsamplers.0.conv")

    # mid: diffusers UNetMidBlock3DCrossAttn = resnets[0]+temp_convs[0],
    # attentions[0]+temp_attentions[0]+resnets[1]+temp_convs[1] — our mid_0
    # carries (resnet0, tc0, attn, temp_attn), mid_1 carries (resnet1, tc1)
    _map_resnet(m, "mid_0/resnet", "mid_block.resnets.0")
    _map_temp_conv(m, "mid_0/temp_conv", "mid_block.temp_convs.0",
                   cfg.temporal_conv_layers)
    _map_spatial_transformer(m, "mid_0/spatial_attn", "mid_block.attentions.0")
    if cfg.use_temporal_attention:
        _map_temporal_transformer(m, "mid_0/temporal_attn",
                                  "mid_block.temp_attentions.0")
    _map_resnet(m, "mid_1/resnet", "mid_block.resnets.1")
    _map_temp_conv(m, "mid_1/temp_conv", "mid_block.temp_convs.1",
                   cfg.temporal_conv_layers)

    # up path: diffusers up_blocks.u <-> our level L-1-u
    for u in range(L):
        level = L - 1 - u
        has_attn = cfg.cross_attention_levels[level]
        for j in range(cfg.layers_per_block + 1):
            map_level_block(f"up_{level}_{j}", f"up_blocks.{u}", j, has_attn)
        if level > 0:
            m.conv2d(f"up_{level}_upsample/conv",
                     f"up_blocks.{u}.upsamplers.0.conv")

    m.norm("conv_norm_out", "conv_norm_out")
    m.conv2d("conv_out_zero", "conv_out")

    leftovers = m.unused()
    if leftovers:
        raise ValueError(f"unconverted UNet keys: {leftovers[:8]}"
                         f"{'...' if len(leftovers) > 8 else ''}")
    return {"params": m.unflatten()}


# --- CLIP text encoder ---------------------------------------------------------


def convert_text_encoder(sd: Dict[str, np.ndarray],
                         cfg: TextEncoderConfig) -> Dict[str, Any]:
    """transformers CLIPTextModel state dict -> models.text_encoder params."""
    m = _Mapper(sd)
    p = "text_model."
    m.put("token_embedding/embedding", m.take(f"{p}embeddings.token_embedding.weight"))
    pos = m.take(f"{p}embeddings.position_embedding.weight")
    m.put("position_embedding", pos[: cfg.max_length])
    for i in range(cfg.num_layers):
        lp, ours = f"{p}encoder.layers.{i}", f"layer{i}"
        m.norm(f"{ours}/ln1", f"{lp}.layer_norm1")
        m.dense(f"{ours}/q", f"{lp}.self_attn.q_proj")
        m.dense(f"{ours}/k", f"{lp}.self_attn.k_proj")
        m.dense(f"{ours}/v", f"{lp}.self_attn.v_proj")
        m.dense(f"{ours}/proj", f"{lp}.self_attn.out_proj")
        m.norm(f"{ours}/ln2", f"{lp}.layer_norm2")
        m.dense(f"{ours}/fc1", f"{lp}.mlp.fc1")
        m.dense(f"{ours}/fc2", f"{lp}.mlp.fc2")
    m.norm("final_ln", f"{p}final_layer_norm")
    leftovers = m.unused(ignore_prefixes=(
        f"{p}embeddings.position_ids",        # buffer in older transformers
        "text_projection",                     # CLIP-with-projection variants
        "logit_scale",
    ))
    if leftovers:
        raise ValueError(f"unconverted text keys: {leftovers[:8]}")
    return {"params": m.unflatten()}


def convert_clip_vision(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """transformers CLIPVisionModel(+projection) -> models.clip_vision params.

    Handles the `vision_model.` tree of a full CLIPModel checkpoint (the
    scorer the reference loads as openai/clip-vit-base-patch32,
    `/root/reference/InferNet/template/validator/scoring.py:69-151`)."""
    m = _Mapper(sd)
    p = "vision_model."
    m.put("cls_token",
          m.take(f"{p}embeddings.class_embedding").reshape(1, 1, -1))
    m.put("patch_embed/kernel",
          t_conv2d(m.take(f"{p}embeddings.patch_embedding.weight")))
    m.put("pos_embedding",
          m.take(f"{p}embeddings.position_embedding.weight")[None])
    m.norm("pre_ln", f"{p}pre_layrnorm")       # (sic — HF's key name)
    for i in range(cfg.num_layers):
        lp, ours = f"{p}encoder.layers.{i}", f"layer{i}"
        m.norm(f"{ours}/ln1", f"{lp}.layer_norm1")
        m.dense(f"{ours}/q", f"{lp}.self_attn.q_proj")
        m.dense(f"{ours}/k", f"{lp}.self_attn.k_proj")
        m.dense(f"{ours}/v", f"{lp}.self_attn.v_proj")
        m.dense(f"{ours}/proj", f"{lp}.self_attn.out_proj")
        m.norm(f"{ours}/ln2", f"{lp}.layer_norm2")
        m.dense(f"{ours}/fc1", f"{lp}.mlp.fc1")
        m.dense(f"{ours}/fc2", f"{lp}.mlp.fc2")
    m.norm("post_ln", f"{p}post_layernorm")
    m.dense("visual_projection", "visual_projection", bias=False)
    leftovers = m.unused(ignore_prefixes=(f"{p}embeddings.position_ids",))
    if leftovers:
        raise ValueError(f"unconverted vision keys: {leftovers[:8]}")
    return {"params": m.unflatten()}


def load_clip_scorer(root: str):
    """A transformers CLIPModel checkpoint directory (model.safetensors with
    both towers + projections, config.json, tokenizer/) -> a CLIPScorer with
    REAL weights, real preprocessing (CLIP mean/std) and the real BPE
    tokenizer — the reference's openai/clip-vit-base-patch32 scorer
    (`scoring.py:69-151`) without the diffusers/transformers runtime."""
    from ..models.clip_vision import VisionConfig
    from ..scoring.clip_score import CLIPScorer

    cfgd = _read_config(root)
    t = cfgd.get("text_config", cfgd)
    v = cfgd.get("vision_config", cfgd)
    text_cfg = TextEncoderConfig(
        vocab_size=t.get("vocab_size", 49408),
        hidden_size=t.get("hidden_size", 512),
        num_layers=t.get("num_hidden_layers", 12),
        num_heads=t.get("num_attention_heads", 8),
        intermediate_size=t.get("intermediate_size", 2048),
        max_length=t.get("max_position_embeddings", 77),
        hidden_act=t.get("hidden_act", "quick_gelu"),
        layer_norm_eps=t.get("layer_norm_eps", 1e-5),
        eos_token_id=t.get("eos_token_id", 49407),
        dtype="float32",
    )
    vision_cfg = VisionConfig(
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 32),
        hidden_size=v.get("hidden_size", 768),
        num_layers=v.get("num_hidden_layers", 12),
        num_heads=v.get("num_attention_heads", 12),
        intermediate_size=v.get("intermediate_size", 3072),
        projection_dim=cfgd.get("projection_dim", 512),
        hidden_act=v.get("hidden_act", "quick_gelu"),
        layer_norm_eps=v.get("layer_norm_eps", 1e-5),
        dtype="float32",
    )
    sd = load_state_dict(root)
    vision_sd = {k: a for k, a in sd.items()
                 if k.startswith("vision_model.") or k.startswith("visual_projection")}
    text_sd = {k: a for k, a in sd.items()
               if k.startswith("text_model.") or k.startswith("text_projection")
               or k == "logit_scale"}
    params = {
        "vision": convert_clip_vision(vision_sd, vision_cfg),
        "text": convert_text_encoder(text_sd, text_cfg),
        "text_proj": t_linear(text_sd["text_projection.weight"]),
    }
    tokenizer = None
    tok_dir = os.path.join(root, "tokenizer")
    for cand in (tok_dir, root):
        if os.path.exists(os.path.join(cand, "vocab.json")):
            from ..models.tokenizer import CLIPBPETokenizer

            tokenizer = CLIPBPETokenizer.from_dir(cand)
            break
    return CLIPScorer(vision_cfg=vision_cfg, text_cfg=text_cfg, params=params,
                      preprocess="clip", tokenizer=tokenizer)


def convert_lpips(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """lpips-package ('alex') state dict -> scoring.lpips.LPIPS params.

    Keys: scaling_layer.{shift,scale} (1,3,1,1), net.sliceK.I.{weight,bias}
    (the torchvision AlexNet convs inside the slice Sequentials),
    linK.model.1.weight (1,C,1,1). The reference's MD-VQS uses lpips(alex)
    (`scoring.py:269-309`)."""
    import numpy as _np

    from ..scoring.lpips import ALEX_LAYERS, LPIPS_SCALE, LPIPS_SHIFT

    m = _Mapper(sd)
    out: Dict[str, Any] = {}
    out["shift"] = (m.take("scaling_layer.shift").reshape(3)
                    if m.has("scaling_layer.shift") else LPIPS_SHIFT)
    out["scale"] = (m.take("scaling_layer.scale").reshape(3)
                    if m.has("scaling_layer.scale") else LPIPS_SCALE)
    # conv position inside each slice Sequential: slice1 starts with the
    # conv; slices 2-3 start with the preceding maxpool
    conv_idx = {1: 0, 2: 1, 3: 1, 4: 0, 5: 0}
    for i in range(5):
        k = f"net.slice{i + 1}.{conv_idx[i + 1]}"
        out[f"conv{i}/kernel"] = t_conv2d(m.take(f"{k}.weight"))
        out[f"conv{i}/bias"] = m.take(f"{k}.bias")
        lin = m.take(f"lin{i}.model.1.weight")     # (1, C, 1, 1)
        out[f"lin{i}"] = _np.ascontiguousarray(lin.reshape(-1))
        if out[f"lin{i}"].shape[0] != ALEX_LAYERS[i][0]:
            raise ValueError(f"lin{i} width {out[f'lin{i}'].shape} does not "
                             f"match conv{i} channels {ALEX_LAYERS[i][0]}")
    leftovers = m.unused()
    if leftovers:
        raise ValueError(f"unconverted LPIPS keys: {leftovers[:8]}")
    return out


def load_lpips(path: str):
    """.pth/.safetensors LPIPS(alex) checkpoint -> scoring.lpips.LPIPS."""
    import jax

    from ..scoring.lpips import LPIPS

    if os.path.isdir(path):
        sd = load_state_dict(path)
    elif path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = {k: np.asarray(v, np.float32) for k, v in load_file(path).items()}
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.detach().float().numpy() for k, v in raw.items()}
    return LPIPS(params=jax.tree.map(lambda x: x, convert_lpips(sd)))


# --- VAE ----------------------------------------------------------------------


def _map_vae_attention(m: _Mapper, ours: str, hf: str):
    """AutoencoderKL mid attention; handles both modern (group_norm/to_q/
    to_out.0) and legacy (norm/query/proj_attn) key sets."""
    if m.has(f"{hf}.group_norm.weight"):
        m.norm(f"{ours}/norm", f"{hf}.group_norm")
        m.dense(f"{ours}/q", f"{hf}.to_q", conv1x1=True)
        m.dense(f"{ours}/k", f"{hf}.to_k", conv1x1=True)
        m.dense(f"{ours}/v", f"{hf}.to_v", conv1x1=True)
        m.dense(f"{ours}/proj", f"{hf}.to_out.0", conv1x1=True)
    else:
        m.norm(f"{ours}/norm", f"{hf}.norm")
        m.dense(f"{ours}/q", f"{hf}.query", conv1x1=True)
        m.dense(f"{ours}/k", f"{hf}.key", conv1x1=True)
        m.dense(f"{ours}/v", f"{hf}.value", conv1x1=True)
        m.dense(f"{ours}/proj", f"{hf}.proj_attn", conv1x1=True)


def convert_vae_decoder(sd: Dict[str, np.ndarray], cfg: VAEConfig) -> Dict[str, Any]:
    """AutoencoderKL (decoder half + post_quant_conv) -> models.vae.VAEDecoder."""
    m = _Mapper(sd)
    L = len(cfg.channel_mults)
    m.conv2d("post_quant_conv", "post_quant_conv")
    m.conv2d("conv_in", "decoder.conv_in")
    _map_resnet(m, "mid_res1", "decoder.mid_block.resnets.0", time_emb=False)
    if cfg.use_mid_attention:
        _map_vae_attention(m, "mid_attn", "decoder.mid_block.attentions.0")
    _map_resnet(m, "mid_res2", "decoder.mid_block.resnets.1", time_emb=False)
    for u in range(L):
        level = L - 1 - u
        for j in range(cfg.layers_per_block + 1):
            _map_resnet(m, f"up_{level}_{j}",
                        f"decoder.up_blocks.{u}.resnets.{j}", time_emb=False)
        if level > 0:
            m.conv2d(f"up_{level}_conv",
                     f"decoder.up_blocks.{u}.upsamplers.0.conv")
    m.norm("norm_out", "decoder.conv_norm_out")
    m.conv2d("conv_out", "decoder.conv_out")
    leftovers = m.unused(ignore_prefixes=("encoder.", "quant_conv."))
    if leftovers:
        raise ValueError(f"unconverted VAE keys: {leftovers[:8]}")
    return {"params": m.unflatten()}


def convert_vae_encoder(sd: Dict[str, np.ndarray], cfg: VAEConfig) -> Dict[str, Any]:
    """AutoencoderKL encoder half -> models.vae.VAEEncoder (mean path).

    diffusers produces (mean, logvar) via conv_out (2*latent ch) then
    quant_conv (1x1 over 2*latent). Our encoder emits the mean only, so the
    mean rows of quant_conv are folded into conv_out exactly:
      W'[o] = sum_c Q[o,c] * C[c], b' = Q_b[o] + sum_c Q[o,c] * C_b[c]."""
    m = _Mapper(sd)
    L = len(cfg.channel_mults)
    m.conv2d("conv_in", "encoder.conv_in")
    for i in range(L):
        for j in range(cfg.layers_per_block):
            _map_resnet(m, f"down_{i}_{j}", f"encoder.down_blocks.{i}.resnets.{j}",
                        time_emb=False)
        if i < L - 1:
            m.conv2d(f"down_{i}_conv",
                     f"encoder.down_blocks.{i}.downsamplers.0.conv")
    _map_resnet(m, "mid_res1", "encoder.mid_block.resnets.0", time_emb=False)
    if cfg.use_mid_attention:
        _map_vae_attention(m, "mid_attn", "encoder.mid_block.attentions.0")
    _map_resnet(m, "mid_res2", "encoder.mid_block.resnets.1", time_emb=False)
    m.norm("norm_out", "encoder.conv_norm_out")
    cw = m.take("encoder.conv_out.weight")        # (2C, in, 3, 3)
    cb = m.take("encoder.conv_out.bias")
    qw = m.take("quant_conv.weight")[:, :, 0, 0]  # (2C, 2C)
    qb = m.take("quant_conv.bias")
    C = cfg.latent_channels
    w_mean = np.einsum("oc,cihw->oihw", qw[:C], cw)
    b_mean = qb[:C] + qw[:C] @ cb
    m.put("conv_mean/kernel", t_conv2d(w_mean))
    m.put("conv_mean/bias", b_mean)
    leftovers = m.unused(ignore_prefixes=("decoder.", "post_quant_conv."))
    if leftovers:
        raise ValueError(f"unconverted VAE-encoder keys: {leftovers[:8]}")
    return {"params": m.unflatten()}


# --- spec derivation + pipeline assembly ---------------------------------------


def spec_from_diffusers_configs(root: str, name: Optional[str] = None,
                                dtype: str = "bfloat16"):
    """Derive a ModelSpec from the checkpoint's own config.json files."""
    from ..models.zoo import ModelSpec

    u = _read_config(os.path.join(root, "unet"))
    v = _read_config(os.path.join(root, "vae"))
    t = _read_config(os.path.join(root, "text_encoder"))

    blocks = tuple(u["block_out_channels"])
    down_types = u.get("down_block_types",
                       ["CrossAttnDownBlock3D"] * (len(blocks) - 1) + ["DownBlock3D"])
    head_dim = u.get("attention_head_dim", 64)
    if isinstance(head_dim, (list, tuple)):
        head_dim = head_dim[0]
    unet_cfg = UNet3DConfig(
        in_channels=u.get("in_channels", 4),
        out_channels=u.get("out_channels", 4),
        block_out_channels=blocks,
        layers_per_block=u.get("layers_per_block", 2),
        cross_attention_levels=tuple("CrossAttn" in b for b in down_types),
        attention_head_dim=int(head_dim),
        cross_attention_dim=u.get("cross_attention_dim", 1024),
        norm_groups=u.get("norm_num_groups", 32),
        norm_eps=u.get("norm_eps", 1e-5),
        temporal_conv_layers=4,
        temporal_style="diffusers",
        dtype=dtype,
    )
    base = v["block_out_channels"][0]
    vae_cfg = VAEConfig(
        latent_channels=v.get("latent_channels", 4),
        base_channels=base,
        channel_mults=tuple(c // base for c in v["block_out_channels"]),
        layers_per_block=v.get("layers_per_block", 2),
        norm_groups=v.get("norm_num_groups", 32),
        final_tanh=False,
        scaling_factor=v.get("scaling_factor", 0.18215),
        dtype=dtype,
    )
    text_cfg = TextEncoderConfig(
        vocab_size=t["vocab_size"],
        hidden_size=t["hidden_size"],
        num_layers=t["num_hidden_layers"],
        num_heads=t["num_attention_heads"],
        intermediate_size=t["intermediate_size"],
        max_length=t.get("max_position_embeddings", 77),
        hidden_act=t.get("hidden_act", "gelu"),
        layer_norm_eps=t.get("layer_norm_eps", 1e-5),
        eos_token_id=t.get("eos_token_id", 49407),
        dtype=dtype,
    )
    return ModelSpec(name=name or os.path.basename(os.path.normpath(root)),
                     text=text_cfg, vae=vae_cfg, unet=unet_cfg)


def load_diffusers_checkpoint(root: str, name: Optional[str] = None,
                              params_dtype=None, dtype: str = "bfloat16"):
    """Diffusers checkpoint dir -> ready Pipeline with pretrained params and
    the checkpoint's own CLIP tokenizer.

    This is the TPU-native analog of the reference's
    `DiffusionPipeline.from_pretrained(...)` load
    (`/root/reference/Distribution/strategies/fsdp.py:55-62`)."""
    import jax
    import jax.numpy as jnp

    from ..models.text_encoder import CLIPTextEncoder
    from ..models.unet3d import UNet3D
    from ..models.vae import VAEDecoder
    from ..pipelines.text2video import Pipeline

    spec = spec_from_diffusers_configs(root, name=name, dtype=dtype)
    params = {
        "unet": convert_unet3d(load_state_dict(os.path.join(root, "unet")),
                               spec.unet),
        "text": convert_text_encoder(
            load_state_dict(os.path.join(root, "text_encoder")), spec.text),
        "vae_dec": convert_vae_decoder(
            load_state_dict(os.path.join(root, "vae")), spec.vae),
    }
    if params_dtype is None:
        params_dtype = spec.unet.compute_dtype
    params = jax.tree.map(lambda x: jnp.asarray(x, params_dtype)
                          if np.issubdtype(np.asarray(x).dtype, np.floating)
                          else jnp.asarray(x), params)

    tokenizer = None
    tok_dir = os.path.join(root, "tokenizer")
    if os.path.exists(os.path.join(tok_dir, "vocab.json")):
        from ..models.tokenizer import CLIPBPETokenizer

        tokenizer = CLIPBPETokenizer.from_dir(tok_dir)

    return Pipeline(spec=spec, unet=UNet3D(spec.unet),
                    text_encoder=CLIPTextEncoder(spec.text),
                    vae_decoder=VAEDecoder(spec.vae), params=params,
                    tokenizer=tokenizer)


def main(argv=None):
    """Converter CLI: inspect/convert a diffusers checkpoint directory.

      python -m dvdx_tpu.utils.convert --src /ckpts/zeroscope_v2_576w \\
          [--orbax-out /ckpts/zeroscope_orbax] [--dtype bfloat16] [--cpu]

    Prints a JSON summary (derived spec + per-component parameter counts);
    --orbax-out additionally saves the converted tree as an orbax checkpoint
    for the services' --params-ckpt weight-distribution path."""
    import argparse
    import json as _json

    ap = argparse.ArgumentParser(description="diffusers -> dvdx_tpu converter")
    ap.add_argument("--src", required=True, help="diffusers checkpoint dir")
    ap.add_argument("--orbax-out", default="")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from .init import param_count

    pipe = load_diffusers_checkpoint(args.src, dtype=args.dtype)
    summary = {
        "model": pipe.spec.name,
        "unet_params": param_count(pipe.params["unet"]),
        "text_params": param_count(pipe.params["text"]),
        "vae_dec_params": param_count(pipe.params["vae_dec"]),
        "tokenizer": "clip-bpe" if pipe.tokenizer is not None else "hash-fallback",
        "vocab_size": pipe.spec.text.vocab_size,
        "block_out_channels": list(pipe.spec.unet.block_out_channels),
        "cross_attention_dim": pipe.spec.unet.cross_attention_dim,
        "dtype": args.dtype,
    }
    if args.orbax_out:
        from .checkpoint import save_params

        save_params(pipe.params, args.orbax_out)
        summary["orbax_out"] = args.orbax_out
    print(_json.dumps(summary))


if __name__ == "__main__":
    main()
