"""Round-3 fused transformer kernels vs their XLA references (interpret mode
on CPU): packed block-diagonal temporal attention and the fused GEGLU FF.
These carry the step-time reduction of the activation-bound UNet step
(docs/PERF_NOTES.md round-3 profile)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dvdx_tpu.ops.pallas.geglu_ff import geglu_ff, geglu_ff_reference
from dvdx_tpu.ops.pallas.temporal_attention import (
    choose_blocking,
    packing_width,
    temporal_attention,
    temporal_attention_reference,
)


@pytest.mark.parametrize("f,expected_w", [(16, 8), (24, 5), (8, 16), (6, 20)])
def test_packing_width(f, expected_w):
    w = packing_width(f)
    assert w == expected_w
    assert (w * f) % 8 == 0 and w * f <= 128


@pytest.mark.parametrize("f,hd,heads", [
    (16, 320, 8), (16, 640, 8), (16, 1280, 8),   # standard UNet levels
    (24, 320, 8), (24, 640, 8), (24, 1280, 8),   # XL frame count (r3: the
    (24, 320, 1),                                # W=5/bp=20 choice failed
    (8, 512, 8), (12, 384, 6), (16, 512, 8),     # Mosaic lowering on TPU)
])
def test_choose_blocking_tpu_legal(f, hd, heads):
    """Every UNet geometry must get a Mosaic-legal block: the position axis
    is the block's sublane dim (bp % 8 == 0), groups slice evenly
    (bp % w == 0), and the measured VMEM bounds hold."""
    w, bp = choose_blocking(f, hd, heads)
    assert w > 0 and bp > 0
    r = w * f
    assert (r % 8 == 0 or r == 128) and r <= 128
    assert bp % 8 == 0, f"sublane-illegal bp={bp} (Mosaic requires bp%8==0)"
    assert bp % w == 0
    gpp = bp // w
    assert bp * f * hd * 30 <= 11 * 2**20          # block residency bound
    assert gpp * r * r * 8 * heads <= 4 * 2**20    # head temporaries bound


@pytest.mark.parametrize("b,f,n,h,d", [
    (1, 16, 64, 2, 64),
    (2, 16, 96, 1, 32),
    (1, 24, 40, 2, 64),    # W=5, R=120 (XL frame count), ragged n % W
    (1, 16, 50, 1, 64),    # n not a multiple of the position block
    (1, 8, 64, 2, 40),     # transformer_in head_dim=40 geometry
])
def test_temporal_attention_matches_einsum(b, f, n, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, f, n, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, f, n, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, f, n, h * d)).astype(np.float32))
    ref = temporal_attention_reference(q, k, v, heads=h)
    out = temporal_attention(q, k, v, heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_temporal_attention_bf16_close():
    rng = np.random.default_rng(1)
    shape = (2, 16, 80, 2 * 64)
    q = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    ref = temporal_attention_reference(q, k, v, heads=2).astype(jnp.float32)
    out = temporal_attention(q, k, v, heads=2,
                             interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("t,c,inner,block_t,block_i", [
    (128, 64, 256, 64, None),
    (100, 64, 256, 64, None),   # ragged token tail
    (64, 96, 128, 64, None),
    (100, 64, 256, 64, 128),    # inner-blocked accumulation (deep levels)
])
def test_geglu_ff_matches_reference(t, c, inner, block_t, block_i):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, t // 2, c)).astype(np.float32))
    w_in = jnp.asarray(rng.normal(size=(c, 2 * inner)).astype(np.float32) * 0.05)
    b_in = jnp.asarray(rng.normal(size=(2 * inner,)).astype(np.float32) * 0.05)
    w_out = jnp.asarray(rng.normal(size=(inner, c)).astype(np.float32) * 0.05)
    b_out = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.05)
    ref = geglu_ff_reference(x, w_in, b_in, w_out, b_out)
    out = geglu_ff(x, w_in, b_in, w_out, b_out, block_t=block_t,
                   block_i=block_i, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_geglu_ff_bf16_close():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 128, 64)), jnp.bfloat16)
    w_in = jnp.asarray(rng.normal(size=(64, 512)) * 0.05, jnp.float32)
    b_in = jnp.zeros((512,), jnp.float32)
    w_out = jnp.asarray(rng.normal(size=(256, 64)) * 0.05, jnp.float32)
    b_out = jnp.zeros((64,), jnp.float32)
    ref = geglu_ff_reference(x, w_in, b_in, w_out, b_out).astype(jnp.float32)
    out = geglu_ff(x, w_in, b_in, w_out, b_out, block_t=64,
                   interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


# --- wiring: the flax layers must produce identical param trees and close
# outputs on both dispatch paths (a tree mismatch would break pretrained
# checkpoint loading; the env override flips the branch) -------------------

def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        out = []
        for k, v in tree.items():
            out += _tree_paths(v, prefix + (k,))
        return out
    return [(prefix, tuple(tree.shape))]


def test_geglu_layer_paths_agree(monkeypatch):
    import jax
    from dvdx_tpu.models.layers import GEGLUFeedForward

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 40, 32)),
                    jnp.float32)
    mod = GEGLUFeedForward(32, dtype=jnp.float32)
    monkeypatch.setenv("DVDX_FF_IMPL", "xla")
    params_xla = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params_xla, x)
    monkeypatch.setenv("DVDX_FF_IMPL", "pallas")
    params_pl = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params_xla, x)  # xla-initialised params on pallas path
    assert sorted(_tree_paths(params_xla)) == sorted(_tree_paths(params_pl))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_temporal_layer_paths_agree(monkeypatch):
    import jax
    from dvdx_tpu.models.layers import TransformerTemporal

    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 16, 9, 8, 32)),
                    jnp.float32)
    mod = TransformerTemporal(2, 16, groups=8, dtype=jnp.float32)
    monkeypatch.setenv("DVDX_TEMPORAL_ATTN_IMPL", "xla")
    params_xla = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params_xla, x)
    monkeypatch.setenv("DVDX_TEMPORAL_ATTN_IMPL", "pallas")
    params_pl = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params_xla, x)
    assert sorted(_tree_paths(params_xla)) == sorted(_tree_paths(params_pl))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
