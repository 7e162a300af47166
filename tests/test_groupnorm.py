"""Fused one-pass GroupNorm kernel (ops/groupnorm.py) vs references.

The pallas kernel is validated on CPU through the pallas interpreter against
both the module's jnp twin and flax.linen.GroupNorm (the semantics pretrained
weights were trained under); the FusedGroupNorm flax module must preserve
nn.GroupNorm's parameter tree so converted checkpoints keep loading.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdx_tpu.ops import groupnorm as G


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(G, "_INTERPRET", True)


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), dtype)


@pytest.mark.parametrize("act", ["none", "silu"])
def test_kernel_matches_reference_and_flax(act):
    n, l, c, g = 3, 40, 64, 8
    x = _rand((n, l, c), 0)
    gamma = _rand((c,), 1) * 0.5 + 1.0
    beta = _rand((c,), 2) * 0.1
    bias = jnp.zeros((n, c), x.dtype)

    got = G._gn_pallas(x, gamma, beta, bias, groups=g, eps=1e-5, act=act)
    ref = G._gn_reference(x, gamma, beta, bias, groups=g, eps=1e-5, act=act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    flax_gn = nn.GroupNorm(num_groups=g, epsilon=1e-5)
    params = {"params": {"scale": gamma, "bias": beta}}
    want = flax_gn.apply(params, x)
    if act == "silu":
        want = nn.silu(want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_kernel_pre_bias_matches_add_then_norm():
    """The fused per-sample channel bias (resnet time embedding) must equal
    add-then-normalize."""
    n, l, c, g = 2, 24, 32, 4
    x = _rand((n, l, c), 3)
    gamma = jnp.ones((c,))
    beta = jnp.zeros((c,))
    bias = _rand((n, c), 4)

    got = G._gn_pallas(x, gamma, beta, bias, groups=g, eps=1e-5, act="silu")
    manual = G._gn_reference(x + bias[:, None, :], gamma, beta,
                             jnp.zeros((n, c)), groups=g, eps=1e-5, act="silu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(manual),
                               atol=1e-5, rtol=1e-5)


def test_kernel_bf16_io_f32_stats():
    n, l, c, g = 2, 160, 128, 32
    x = _rand((n, l, c), 5, jnp.bfloat16)
    gamma = jnp.ones((c,))
    beta = jnp.zeros((c,))
    bias = jnp.zeros((n, c), x.dtype)
    got = G._gn_pallas(x, gamma, beta, bias, groups=g, eps=1e-5, act="silu")
    ref = G._gn_reference(x, gamma, beta, bias, groups=g, eps=1e-5, act="silu")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_fused_module_keeps_groupnorm_param_tree():
    """FusedGroupNorm must expose nn.GroupNorm's 'scale'/'bias' params so
    utils/convert.py keeps mapping pretrained weights 1:1."""
    from dvdx_tpu.models.layers import FusedGroupNorm
    from dvdx_tpu.utils.init import fast_init

    m = FusedGroupNorm(groups=4, eps=1e-5, act="silu")
    params = fast_init(m, 0, jnp.zeros((2, 8, 8, 32), jnp.float32))
    leaves = params["params"]
    assert set(leaves) == {"scale", "bias"}
    assert leaves["scale"].shape == (32,) and leaves["bias"].shape == (32,)

    x = _rand((2, 8, 8, 32), 6)
    y = jax.jit(m.apply)(params, x)
    want = G._gn_reference(x.reshape(2, 64, 32), jnp.asarray(leaves["scale"]),
                           jnp.asarray(leaves["bias"]),
                           jnp.zeros((2, 32)), groups=4, eps=1e-5, act="silu")
    np.testing.assert_allclose(np.asarray(y), np.asarray(want).reshape(y.shape),
                               atol=1e-5, rtol=1e-5)
