"""Model shape/identity tests at CPU-test scale."""

import jax
import jax.numpy as jnp
import numpy as np

from dvdx_tpu.models.text_encoder import (
    CLIPTextEncoder,
    init_text_params,
    tiny_text_config,
    tokenize,
    tokenize_batch,
)
from dvdx_tpu.models.unet3d import UNet3D, init_unet_params, tiny_unet_config
from dvdx_tpu.models.vae import VAEDecoder, VAEEncoder, tiny_vae_config


def test_tokenizer_deterministic_and_padded():
    a = tokenize("A cat riding a bike", vocab_size=1024, max_length=16)
    b = tokenize("A cat riding a bike", vocab_size=1024, max_length=16)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (16,)
    assert a[0] == 1  # BOS
    assert 2 in a  # EOS present
    c = tokenize("a different prompt", vocab_size=1024, max_length=16)
    assert not np.array_equal(a, c)


def test_text_encoder_shapes():
    cfg = tiny_text_config()
    params = init_text_params(cfg)
    model = CLIPTextEncoder(cfg)
    ids = jnp.asarray(tokenize_batch(["hello world", "a video"], cfg.vocab_size, cfg.max_length))
    hidden, pooled = jax.jit(model.apply)(params, ids)
    assert hidden.shape == (2, cfg.max_length, cfg.hidden_size)
    assert pooled.shape == (2, cfg.hidden_size)
    assert np.all(np.isfinite(np.asarray(hidden)))


def test_unet_shapes_and_zero_init_output():
    cfg = tiny_unet_config()
    params = init_unet_params(cfg)
    model = UNet3D(cfg)
    lat = jax.random.normal(jax.random.key(0), (1, 4, 16, 16, 4))
    ts = jnp.asarray([500])
    ctx = jax.random.normal(jax.random.key(1), (1, 8, cfg.cross_attention_dim))
    eps = jax.jit(model.apply)(params, lat, ts, ctx)
    assert eps.shape == lat.shape
    # conv_out is zero-init => initial prediction is exactly zero
    np.testing.assert_array_equal(np.asarray(eps), 0.0)


def test_unet_frame_positions_affect_output():
    """With rotary temporal attention, shifting absolute frame positions must
    change activations (the property chunked execution relies on)."""
    from dvdx_tpu.utils.testing import perturb_zero_params

    cfg = tiny_unet_config()
    params = perturb_zero_params(init_unet_params(cfg), seed=1)
    model = UNet3D(cfg)

    lat = jax.random.normal(jax.random.key(0), (1, 4, 16, 16, 4))
    ts = jnp.asarray([500])
    ctx = jax.random.normal(jax.random.key(1), (1, 8, cfg.cross_attention_dim))
    apply = jax.jit(model.apply)
    a = apply(params, lat, ts, ctx, jnp.arange(4))
    b = apply(params, lat, ts, ctx, jnp.arange(4) + 8)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_vae_decode_shapes():
    cfg = tiny_vae_config()
    dec = VAEDecoder(cfg)
    from dvdx_tpu.utils.init import fast_init
    params = fast_init(dec, 0, jnp.zeros((1, 8, 8, 4)))
    z = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    img = jax.jit(dec.apply)(params, z)
    assert img.shape == (2, 8 * cfg.downscale, 8 * cfg.downscale, 3)
    x = np.asarray(img)
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_vae_encoder_shapes():
    from dvdx_tpu.utils.init import fast_init
    cfg = tiny_vae_config()
    enc = VAEEncoder(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 16, 16, 3))
    params = fast_init(enc, 1, x)
    z = jax.jit(enc.apply)(params, x)
    assert z.shape == (1, 16 // cfg.downscale, 16 // cfg.downscale, 4)
