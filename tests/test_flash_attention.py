"""Flash attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdx_tpu.ops.attention import _xla_attention
from dvdx_tpu.ops.pallas.flash_attention import flash_attention


@pytest.mark.parametrize("b,s,h,d", [
    (1, 128, 2, 64),
    (2, 300, 2, 64),   # non-divisible seq -> padding + masking path
    (1, 640, 1, 32),
])
def test_flash_matches_xla(b, s, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    scale = d**-0.5
    ref = _xla_attention(q, k, v, scale)
    out = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_bf16_close():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 256, 2, 64)), jnp.bfloat16)
    ref = _xla_attention(q, k, v, 64**-0.5).astype(jnp.float32)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2, rtol=3e-2)


def _pad_heads(x4, dp):
    """(B,S,H,D) -> (B,S,H*dp) zero-padded head strips (what the padded
    projection weights produce for free in-model)."""
    b, s, h, d = x4.shape
    xp = jnp.pad(x4, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    return xp.reshape(b, s, h * dp)


@pytest.mark.parametrize("b,s,t,h,d,kw", [
    (2, 256, 256, 5, 64, dict(onepass=True, block_q=128)),     # self, odd heads
    (2, 256, 256, 2, 64, dict(onepass=False, block_q=128, block_k=128)),
    (1, 384, 384, 3, 64, dict(onepass=False, block_q=128, block_k=128)),
    (2, 256, 77, 4, 64, dict(onepass=True, block_q=128)),      # cross, masked
    (1, 256, 256, 2, 128, dict(onepass=True, block_q=128)),    # dp == d
])
def test_flash_mh_matches_xla(b, s, t, h, d, kw):
    """Multi-head-native schedule (head strips in the lane dim, padded to
    128) must equal the XLA reference for self- and cross-attention on both
    the one-pass and blocked paths."""
    from dvdx_tpu.ops.pallas.flash_attention import flash_attention_mh

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h, d)).astype(np.float32))
    ref = _xla_attention(q, k, v, d**-0.5)
    dp = 128 if d < 128 else d
    out = flash_attention_mh(_pad_heads(q, dp), _pad_heads(k, dp),
                             _pad_heads(v, dp), heads=h, head_dim=d,
                             interpret=True, **kw)
    out4 = out.reshape(b, s, h, dp)[..., :d]
    np.testing.assert_allclose(np.asarray(out4), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # padded lanes must be exactly zero (to_out's padded rows rely on it)
    if dp > d:
        assert np.all(np.asarray(out.reshape(b, s, h, dp)[..., d:]) == 0.0)


def test_attention_layer_native_mh_matches_dense_path(monkeypatch):
    """layers.Attention's native-mh branch (padded projection weights +
    flash_attention_mh) must match the nn.Dense + multi_head_attention
    branch with the SAME param tree — checkpoints are branch-agnostic."""
    from dvdx_tpu.models.layers import Attention

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 512, 96)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 77, 64)).astype(np.float32))
    mod = Attention(num_heads=3, head_dim=32, out_dim=96)
    monkeypatch.delenv("DVDX_ATTN_MH_IMPL", raising=False)
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    ref = mod.apply(params, x, ctx)
    monkeypatch.setenv("DVDX_ATTN_MH_IMPL", "pallas")
    params_mh = mod.init(jax.random.PRNGKey(0), x, ctx)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_mh)
    out = mod.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("s,kw,label", [
    # blocked recurrence, S divides the blocks -> the bias-mask is compiled
    # out entirely (the XL S=9216 @ 1024x1024 situation)
    (512, dict(onepass=False, block_q=256, block_k=256), "blocked-unmasked"),
    # blocked recurrence with a padded tail -> additive-bias mask path
    (450, dict(onepass=False, block_q=256, block_k=256), "blocked-masked"),
    # one-pass, exact fit vs padded tail
    (512, dict(onepass=True, block_q=256), "onepass-unmasked"),
    (450, dict(onepass=True, block_q=256), "onepass-masked"),
])
def test_mask_paths_match_xla(s, kw, label):
    """Both kernels must agree with XLA on BOTH sides of the masked/unmasked
    fork (the unmasked specialisation removes the pad-bias entirely; a bug
    there would silently attend to garbage keys)."""
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(2, s, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, s, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, s, 2, 64)), jnp.bfloat16)
    ref = _xla_attention(q, k, v, 64**-0.5).astype(jnp.float32)
    out = flash_attention(q, k, v, interpret=True, **kw).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2, err_msg=label)
