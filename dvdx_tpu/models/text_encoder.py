"""CLIP-style text encoder + self-contained deterministic tokenizer.

Capability match for the CLIP text tower the reference loads via diffusers
(`/root/reference/Distribution/strategies/fsdp.py:55-62`; text encoding at
`fsdp.py:95-103`, `InferNet/neurons/miner.py:557-568`). The reference depends
on HuggingFace-hosted weights + BPE vocab; this framework has no egress, so:

* the encoder is a standard pre-LN causal transformer (Flax), configurable to
  ViT-H-text scale (hidden 1024, as Zeroscope's cross_attention_dim=1024);
* tokenisation is a deterministic, dependency-free hash tokenizer — stable
  across hosts/versions so miner and validator agree on token ids (part of the
  Proof-of-Inference determinism chain).
"""

from __future__ import annotations

import dataclasses
import hashlib
import re
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    max_length: int = 77
    # HF CLIPTextModel parity: 'gelu' (exact erf — the OpenCLIP-converted
    # towers Zeroscope uses) or 'quick_gelu' (openai ViT-L family)
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 2          # real CLIP vocab: 49407
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


def tiny_text_config() -> TextEncoderConfig:
    return TextEncoderConfig(vocab_size=1024, hidden_size=64, num_layers=2,
                             num_heads=4, intermediate_size=128, max_length=16,
                             dtype="float32")


def _activation(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        return lambda x: nn.gelu(x, approximate=True)
    raise ValueError(f"unknown activation {name!r}")


BOS_ID = 1
EOS_ID = 2
PAD_ID = 0
_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")


def tokenize(text: str, vocab_size: int = 49408, max_length: int = 77) -> np.ndarray:
    """Deterministic hash tokenizer. Lowercases, splits on words/punct, maps
    each token to 3 + (sha256(token) mod (vocab_size - 3)). Pads/truncates to
    max_length with BOS/EOS framing. Returns (max_length,) int32."""
    words = _WORD_RE.findall(text.lower())
    ids = [BOS_ID]
    for wrd in words[: max_length - 2]:
        digest = hashlib.sha256(wrd.encode("utf-8")).digest()
        ids.append(3 + int.from_bytes(digest[:8], "big") % (vocab_size - 3))
    ids.append(EOS_ID)
    ids = ids[:max_length] + [PAD_ID] * (max_length - len(ids))
    return np.asarray(ids, dtype=np.int32)


def tokenize_batch(texts: List[str], vocab_size: int = 49408, max_length: int = 77) -> np.ndarray:
    return np.stack([tokenize(t, vocab_size, max_length) for t in texts])


class _TextBlock(nn.Module):
    cfg: TextEncoderConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt = cfg.compute_dtype
        head_dim = cfg.hidden_size // cfg.num_heads
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt, name="ln1")(x)
        q = nn.Dense(cfg.hidden_size, dtype=dt, name="q")(h)
        k = nn.Dense(cfg.hidden_size, dtype=dt, name="k")(h)
        v = nn.Dense(cfg.hidden_size, dtype=dt, name="v")(h)
        b, s, _ = q.shape
        q = q.reshape(b, s, cfg.num_heads, head_dim)
        k = k.reshape(b, s, cfg.num_heads, head_dim)
        v = v.reshape(b, s, cfg.num_heads, head_dim)
        # causal mask via large-negative additive bias, CLIP-style
        logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
        logits = logits * (head_dim**-0.5)
        causal = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(causal[None, None], logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhst,bthd->bshd", probs, v, preferred_element_type=jnp.float32)
        o = o.astype(dt).reshape(b, s, cfg.hidden_size)
        x = x + nn.Dense(cfg.hidden_size, dtype=dt, name="proj")(o)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt, name="ln2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=dt, name="fc1")(h)
        h = _activation(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=dt, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """token ids (B, S) -> hidden states (B, S, hidden) + pooled (B, hidden)."""

    cfg: TextEncoderConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        dt = cfg.compute_dtype
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=dt, name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.max_length, cfg.hidden_size))
        x = tok + pos[None, :s].astype(dt)
        # CLIP-style: causal mask only; padding influence is cut by pooling at
        # the (first) EOS position rather than by masking logits
        for i in range(cfg.num_layers):
            x = _TextBlock(cfg, name=f"layer{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt, name="final_ln")(x)
        # pooled = hidden at the first EOS position (CLIP convention; with the
        # real vocab EOS=49407 is also the max id, so this matches HF exactly)
        eos_pos = jnp.argmax(input_ids == cfg.eos_token_id, axis=-1)
        pooled = jnp.take_along_axis(x, eos_pos[:, None, None], axis=1)[:, 0]
        return x, pooled


def init_text_params(cfg: TextEncoderConfig, seed: int = 0, **init_kwargs):
    from ..utils.init import fast_init

    model = CLIPTextEncoder(cfg)
    ids = jnp.zeros((1, cfg.max_length), jnp.int32)
    return fast_init(model, seed, ids, **init_kwargs)
