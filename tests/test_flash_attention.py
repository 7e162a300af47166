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
