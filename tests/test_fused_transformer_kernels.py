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


# --- position-major variant (round 3b): the packed-row regroup is a free
# view, removing the in-VMEM swapaxes that kept the frame-major kernel 5-7x
# above its HBM floor at XL (docs/PERF_NOTES.md) -----------------------------


@pytest.mark.parametrize("f,hd,heads", [
    (16, 320, 8), (16, 640, 8), (16, 1280, 8),
    (24, 320, 8), (24, 640, 8), (24, 1280, 8),   # XL: W=5/R=120 now legal
    (8, 512, 8), (16, 512, 8), (24, 320, 1),
])
def test_choose_blocking_posmajor_legal(f, hd, heads):
    from dvdx_tpu.ops.pallas.temporal_attention import choose_blocking_posmajor

    w, bp = choose_blocking_posmajor(f, hd, heads)
    assert w == 128 // f and bp % w == 0
    r = w * f
    assert r <= 128 and f % 8 == 0
    # io blocks (4x, double-buffered) and per-head f32 temporaries budgets
    assert 4 * bp * f * hd * 2 <= 6 * 2**20
    assert (bp // w) * r * r * 12 <= 4 * 2**20


def test_choose_blocking_posmajor_rejects_unaligned_frames():
    from dvdx_tpu.ops.pallas.temporal_attention import choose_blocking_posmajor

    assert choose_blocking_posmajor(12, 384, 6) == (0, 0)   # F % 8 != 0
    assert choose_blocking_posmajor(130, 320, 8) == (0, 0)  # F > 128


@pytest.mark.parametrize("b,f,n,h,d", [
    (1, 16, 64, 2, 64),
    (2, 16, 96, 1, 32),
    (1, 24, 40, 2, 64),    # XL frame count, tiny/ragged n
    (1, 16, 50, 1, 64),    # n not a multiple of the position block
    (1, 8, 200, 2, 40),    # transformer_in head_dim=40, ragged tail
])
def test_temporal_attention_posmajor_matches_reference(b, f, n, h, d):
    from dvdx_tpu.ops.pallas.temporal_attention import (
        temporal_attention_posmajor, temporal_attention_posmajor_reference)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, n, f, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, f, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, f, h * d)).astype(np.float32))
    ref = temporal_attention_posmajor_reference(q, k, v, heads=h)
    out = temporal_attention_posmajor(q, k, v, heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


# --- fused whole-block kernel (round 4b): LN x3 + both packed attentions +
# GEGLU FF as ONE pallas kernel, weights VMEM-resident ------------------------


@pytest.mark.parametrize("b,f,n,h,d", [
    (1, 16, 64, 2, 64),
    (2, 16, 96, 1, 32),
    (1, 24, 40, 2, 64),    # XL frame count, ragged position tail
    (1, 8, 200, 2, 40),    # transformer_in head geometry (d=40, unaligned)
    (1, 4, 24, 2, 16),     # tiny-test scale
])
def test_fused_temporal_block_matches_unfused(b, f, n, h, d, monkeypatch):
    """The whole-block kernel must equal the unfused _TemporalBlock (einsum
    attention path) on the same params."""
    import jax
    from dvdx_tpu.models.layers import _TemporalBlock

    dim = h * d
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, f, n, dim)).astype(np.float32))
    mod = _TemporalBlock(dim, h, d, dtype=jnp.float32)
    monkeypatch.setenv("DVDX_TEMPORAL_BLOCK_IMPL", "xla")
    monkeypatch.setenv("DVDX_TEMPORAL_ATTN_IMPL", "xla")
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    monkeypatch.setenv("DVDX_TEMPORAL_BLOCK_IMPL", "pallas")
    monkeypatch.delenv("DVDX_TEMPORAL_ATTN_IMPL")
    params_f = mod.init(jax.random.PRNGKey(0), x)
    assert sorted(_tree_paths(params)) == sorted(_tree_paths(params_f))
    out = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_temporal_block_bf16_close(monkeypatch):
    import jax
    from dvdx_tpu.models.layers import _TemporalBlock

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 72, 128)), jnp.bfloat16)
    mod = _TemporalBlock(128, 2, 64, dtype=jnp.bfloat16)
    monkeypatch.setenv("DVDX_TEMPORAL_BLOCK_IMPL", "xla")
    monkeypatch.setenv("DVDX_TEMPORAL_ATTN_IMPL", "xla")
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x).astype(jnp.float32)
    monkeypatch.setenv("DVDX_TEMPORAL_BLOCK_IMPL", "pallas")
    monkeypatch.delenv("DVDX_TEMPORAL_ATTN_IMPL")
    out = mod.apply(params, x).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_fused_block_respects_resident_weight_bound():
    from dvdx_tpu.ops.pallas.temporal_block import choose_blocking_block

    assert choose_blocking_block(16, 320, 5)[0] == 8
    assert choose_blocking_block(24, 320, 5)[0] == 8
    assert choose_blocking_block(16, 640, 10) == (0, 0)   # weights too big
    assert choose_blocking_block(16, 1280, 20) == (0, 0)


def test_temporal_proj_conv1x1_path_agrees(monkeypatch):
    """TransformerTemporal's 1x1-conv proj path (XL-class folds on TPU) must
    match the Dense path with the SAME param tree."""
    import jax
    from dvdx_tpu.models.layers import TransformerTemporal

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 16, 9, 8, 32)), jnp.float32)
    mod = TransformerTemporal(2, 16, groups=8, dtype=jnp.float32)
    monkeypatch.setenv("DVDX_TEMPORAL_ATTN_IMPL", "xla")
    monkeypatch.setenv("DVDX_TEMPORAL_PROJ_IMPL", "xla")
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    monkeypatch.setenv("DVDX_TEMPORAL_PROJ_IMPL", "pallas")
    params_c = mod.init(jax.random.PRNGKey(0), x)
    assert sorted(_tree_paths(params)) == sorted(_tree_paths(params_c))
    out = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_spatial_proj_conv1x1_path_agrees(monkeypatch):
    """SpatialTransformer's 1x1-conv proj path (TPU default) must match the
    Dense path with the SAME param tree (checkpoints branch-agnostic)."""
    import jax
    from dvdx_tpu.models.layers import SpatialTransformer

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 8, 9, 32)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(2, 7, 48)), jnp.float32)
    mod = SpatialTransformer(2, 16, cross_attention_dim=48, groups=8,
                             dtype=jnp.float32)
    monkeypatch.setenv("DVDX_SPATIAL_PROJ_IMPL", "xla")
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    ref = mod.apply(params, x, ctx)
    monkeypatch.setenv("DVDX_SPATIAL_PROJ_IMPL", "pallas")
    params_c = mod.init(jax.random.PRNGKey(0), x, ctx)
    assert sorted(_tree_paths(params)) == sorted(_tree_paths(params_c))
    out = mod.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


# --- frame-major checkerboard variant (round 4): consumes the NATIVE
# (B, F, N, HD) layout — no position-major HBM transposes at all (those cost
# ~95-101 ms/step at XL) ------------------------------------------------------


@pytest.mark.parametrize("b,f,n,h,d", [
    (1, 16, 64, 2, 64),
    (2, 16, 96, 1, 32),
    (1, 24, 40, 2, 64),    # XL frame count; n not a multiple of bp
    (1, 16, 50, 1, 64),    # ragged position tail
    (1, 8, 200, 2, 40),    # transformer_in head_dim=40
    (1, 12, 64, 3, 32),    # F % 8 != 0 (illegal for posmajor, fine here)
    (1, 4, 24, 2, 16),     # tiny-test scale
])
def test_temporal_attention_fm_matches_reference(b, f, n, h, d):
    from dvdx_tpu.ops.pallas.temporal_attention import temporal_attention_fm

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, f, n, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, f, n, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, f, n, h * d)).astype(np.float32))
    ref = temporal_attention_reference(q, k, v, heads=h)
    out = temporal_attention_fm(q, k, v, heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_temporal_attention_fm_bf16_close():
    from dvdx_tpu.ops.pallas.temporal_attention import temporal_attention_fm

    rng = np.random.default_rng(4)
    shape = (2, 16, 80, 2 * 64)
    q = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    ref = temporal_attention_reference(q, k, v, heads=2).astype(jnp.float32)
    out = temporal_attention_fm(q, k, v, heads=2,
                                interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("f,hd,heads", [
    (16, 320, 8), (24, 320, 8), (24, 1280, 20), (12, 384, 6), (4, 64, 2),
])
def test_choose_blocking_fm_legal(f, hd, heads):
    from dvdx_tpu.ops.pallas.temporal_attention import choose_blocking_fm

    wsub, m = choose_blocking_fm(f, hd, heads)
    assert wsub == 8 and m >= 1
    # io blocks (3x in + out, double-buffered) stay within the VMEM budget
    assert 4 * m * wsub * f * hd * 2 <= 10 * 2**20


def test_posmajor_equals_framemajor_kernel():
    """Both kernels compute the same packed attention — feeding the same
    logical tensor through either layout must agree."""
    from dvdx_tpu.ops.pallas.temporal_attention import (
        temporal_attention, temporal_attention_posmajor)

    rng = np.random.default_rng(2)
    b, f, n, h, d = 1, 16, 72, 2, 64
    q = jnp.asarray(rng.normal(size=(b, f, n, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, f, n, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, f, n, h * d)).astype(np.float32))
    fm = temporal_attention(q, k, v, heads=h, interpret=True)
    pm = temporal_attention_posmajor(jnp.swapaxes(q, 1, 2),
                                     jnp.swapaxes(k, 1, 2),
                                     jnp.swapaxes(v, 1, 2),
                                     heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(pm, 1, 2)),
                               np.asarray(fm), atol=1e-5, rtol=1e-5)


def test_transformer_temporal_module_posmajor_equivalence(monkeypatch):
    """The full TransformerTemporal module (GN -> hoisted relayout ->
    proj_in -> attn1/attn2/FF -> proj_out -> relayout back) must match the
    default einsum program — same params, same inputs."""
    import jax

    from dvdx_tpu.models.layers import TransformerTemporal

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 64)).astype(np.float32))
    mod = TransformerTemporal(num_heads=2, head_dim=32)
    monkeypatch.setenv("DVDX_TEMPORAL_ATTN_IMPL", "xla")
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    monkeypatch.setenv("DVDX_TEMPORAL_ATTN_IMPL", "posmajor")
    out = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


# --- fused spatial tail (round 4c): everything after attn1's PV output —
# out-proj, LN2 + 77-token cross-attention, LN3 + GEGLU FF, residuals — as
# ONE row-local pallas kernel (attn1 keeps its flash ceiling) ----------------


@pytest.mark.parametrize("b,s,h,d,t,cx", [
    (2, 64, 2, 16, 7, 48),     # ctx pads 7 -> 128 lanes (masked softmax)
    (1, 96, 3, 16, 77, 64),    # real CLIP token count, odd head count
    (1, 128, 1, 32, 130, 40),  # ctx spills into a second 128-lane tile
])
def test_fused_spatial_tail_matches_unfused(b, s, h, d, t, cx, monkeypatch):
    """The fused-tail block must equal the unfused BasicTransformerBlock
    (einsum attention path) on the same params."""
    import jax
    from dvdx_tpu.models.layers import BasicTransformerBlock

    dim = h * d
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, dim)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(b, t, cx)).astype(np.float32))
    mod = BasicTransformerBlock(dim, h, d, cross_attention_dim=cx,
                                dtype=jnp.float32)
    monkeypatch.setenv("DVDX_SPATIAL_BLOCK_IMPL", "xla")
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    ref = mod.apply(params, x, ctx)
    monkeypatch.setenv("DVDX_SPATIAL_BLOCK_IMPL", "pallas")
    params_f = mod.init(jax.random.PRNGKey(0), x, ctx)
    assert sorted(_tree_paths(params)) == sorted(_tree_paths(params_f))
    out = mod.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_spatial_tail_bf16_close(monkeypatch):
    import jax
    from dvdx_tpu.models.layers import BasicTransformerBlock

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 64)), jnp.bfloat16)
    ctx = jnp.asarray(rng.normal(size=(1, 7, 48)), jnp.bfloat16)
    mod = BasicTransformerBlock(64, 2, 32, cross_attention_dim=48,
                                dtype=jnp.bfloat16)
    monkeypatch.setenv("DVDX_SPATIAL_BLOCK_IMPL", "xla")
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    ref = mod.apply(params, x, ctx).astype(jnp.float32)
    monkeypatch.setenv("DVDX_SPATIAL_BLOCK_IMPL", "pallas")
    out = mod.apply(params, x, ctx).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_fused_spatial_tail_double_self_unaffected(monkeypatch):
    """double_self blocks (temporal semantics) never take the fused-tail
    path even when forced — attn2 self-attends there, not cross."""
    import jax
    from dvdx_tpu.models.layers import BasicTransformerBlock

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 64, 32)).astype(np.float32))
    mod = BasicTransformerBlock(32, 2, 16, double_self=True,
                                dtype=jnp.float32)
    monkeypatch.setenv("DVDX_SPATIAL_BLOCK_IMPL", "xla")
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)
    monkeypatch.setenv("DVDX_SPATIAL_BLOCK_IMPL", "pallas")
    out = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0, rtol=0)


def test_choose_block_rows_bounds():
    from dvdx_tpu.ops.pallas.spatial_tail import choose_block_rows

    # standard level 0: S=2880, C=HD=320, 5 heads, ctx pads to 128
    bs = choose_block_rows(2880, 320, 320, 128, heads=5)
    assert bs > 0 and 2880 % bs == 0 and bs % 8 == 0
    # XL level 0: S=9216
    bs = choose_block_rows(9216, 320, 320, 128, heads=5)
    assert bs > 0 and 9216 % bs == 0 and bs % 8 == 0
    # deep levels exceed the resident-weight bound
    assert choose_block_rows(720, 640, 640, 128, heads=10) == 0
    assert choose_block_rows(180, 1280, 1280, 128, heads=20) == 0


def test_fused_spatial_tail_composes_with_mh_native(monkeypatch):
    """DVDX_ATTN_MH_IMPL=pallas + fused tail: the kernel's o1 operand is the
    mh-native lane-padded width, o1_w the matching pad_head_rows weight —
    must still equal the fully-unfused block."""
    import jax
    from dvdx_tpu.models.layers import BasicTransformerBlock

    rng = np.random.default_rng(3)
    b, s, h, d, t, cx = 1, 1024, 2, 64, 7, 48
    dim = h * d
    x = jnp.asarray(rng.normal(size=(b, s, dim)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(b, t, cx)).astype(np.float32))
    mod = BasicTransformerBlock(dim, h, d, cross_attention_dim=cx,
                                dtype=jnp.float32)
    monkeypatch.setenv("DVDX_SPATIAL_BLOCK_IMPL", "xla")
    monkeypatch.setenv("DVDX_ATTN_IMPL", "xla")
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    ref = mod.apply(params, x, ctx)
    monkeypatch.delenv("DVDX_ATTN_IMPL")
    monkeypatch.setenv("DVDX_SPATIAL_BLOCK_IMPL", "pallas")
    monkeypatch.setenv("DVDX_ATTN_MH_IMPL", "pallas")
    params_f = mod.init(jax.random.PRNGKey(0), x, ctx)
    assert sorted(_tree_paths(params)) == sorted(_tree_paths(params_f))
    out = mod.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


# --- streamed-weight fused tail (round 5): the C=640 lever, measured -------
# The resident kernel refuses C > 384 (12*C^2 bf16 GEGLU pair). The streamed
# variant runs the post-attn chain once per row tile into VMEM scratch and
# streams the FF pair through the grid (the geglu_ff schedule) — VERDICT r4
# item 4's "build it and measure" half.


def test_streamed_tail_matches_unfused(monkeypatch):
    import jax
    from dvdx_tpu.models.layers import BasicTransformerBlock

    rng = np.random.default_rng(4)
    b, s, h, d, t, cx = 1, 64, 2, 32, 7, 48
    dim = h * d
    x = jnp.asarray(rng.normal(size=(b, s, dim)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(b, t, cx)).astype(np.float32))
    mod = BasicTransformerBlock(dim, h, d, cross_attention_dim=cx,
                                dtype=jnp.float32)
    monkeypatch.setenv("DVDX_SPATIAL_BLOCK_IMPL", "xla")
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    ref = mod.apply(params, x, ctx)
    monkeypatch.setenv("DVDX_SPATIAL_BLOCK_IMPL", "pallas")
    monkeypatch.setenv("DVDX_SPATIAL_TAIL_IMPL", "streamed")
    params_f = mod.init(jax.random.PRNGKey(0), x, ctx)
    assert sorted(_tree_paths(params)) == sorted(_tree_paths(params_f))
    out = mod.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_streamed_tail_c640_parity(monkeypatch):
    """The actual target shape class: C=640, 10 heads of 64 — infeasible
    resident, feasible streamed; parity vs the unfused block."""
    import jax
    from dvdx_tpu.models.layers import BasicTransformerBlock
    from dvdx_tpu.ops.pallas.spatial_tail import (choose_block_rows,
                                                  choose_block_rows_streamed)

    # flagship C=640 level: S=720 (36x20 latent rows) at standard geometry
    assert choose_block_rows(720, 640, 640, 128, heads=10) == 0
    bs = choose_block_rows_streamed(720, 640, 640, 128, heads=10)
    assert bs > 0 and 720 % bs == 0 and bs % 8 == 0

    rng = np.random.default_rng(5)
    b, s, h, d, t, cx = 1, 16, 10, 64, 77, 64  # tiny S: interpret-mode cost
    dim = h * d
    x = jnp.asarray(rng.normal(size=(b, s, dim)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(b, t, cx)).astype(np.float32))
    mod = BasicTransformerBlock(dim, h, d, cross_attention_dim=cx,
                                dtype=jnp.float32)
    monkeypatch.setenv("DVDX_SPATIAL_BLOCK_IMPL", "xla")
    params = mod.init(jax.random.PRNGKey(0), x, ctx)
    ref = mod.apply(params, x, ctx)
    monkeypatch.setenv("DVDX_SPATIAL_BLOCK_IMPL", "pallas")
    out = mod.apply(params, x, ctx)  # auto-routes: resident infeasible
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)
