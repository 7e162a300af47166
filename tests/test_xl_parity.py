"""Parity at the XL structural geometry + v-prediction scheduling
(VERDICT r3 item 6 — no HF egress in this environment, so the closest
offline proof: the torch-side semantics at the REAL model's structure).

The existing parity suite (tests/test_convert.py) proves the converter and
Flax forward on a 2-level block config. The real zeroscope checkpoints
(576w and XL share one architecture, `/root/reference/InferNet/neurons/
miner.py:83-123`) are 4-level with layers_per_block=2, cross-attention on
the first three levels only, and an ODD head count at level 0
(320/64 = 5 heads — head-pairing tricks and packing assumptions must hold
there). These tests pin that structure — scaled channels, full depth — at
the XL frame count (24), plus DDIM v-prediction parity for the
CogVideoX-class families."""

import numpy as np
import pytest
import torch

from dvdx_tpu.models.unet3d import UNet3D, UNet3DConfig
from dvdx_tpu.ops.scheduler import ddim_step, make_ddim_schedule
from dvdx_tpu.utils.convert import convert_unet3d


def _sd_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model


# --- UNet3D at the real (XL) block structure ---------------------------------


def test_unet3d_xl_structure_parity():
    """4 levels, layers_per_block=2, cross-attn (T,T,T,F), 5 heads at level
    0, 24 frames — the full zeroscope/XL wiring at CPU-testable widths."""
    import jax

    from tests.torch_ref import UNet3DConditionModelRef

    chs = (40, 64, 80, 96)  # level-0 heads = 40/8 = 5 (odd, like 320/64)
    ref = _randomize(UNet3DConditionModelRef(
        block_out_channels=chs, layers_per_block=2,
        cross_levels=(True, True, True, False), head_dim=8, cross_dim=32,
        groups=8, n_temp_convs=4).eval(), seed=11)
    cfg = UNet3DConfig(
        block_out_channels=chs, layers_per_block=2,
        cross_attention_levels=(True, True, True, False),
        attention_head_dim=8, cross_attention_dim=32, norm_groups=8,
        temporal_conv_layers=4, temporal_style="diffusers", dtype="float32")
    params = convert_unet3d(_sd_numpy(ref), cfg)

    rng = np.random.default_rng(5)
    f = 24                                                # XL frame count
    lat = rng.normal(0, 1, (1, f, 16, 16, 4)).astype(np.float32)
    ehs = rng.normal(0, 1, (1, 7, 32)).astype(np.float32)
    ts = np.array([801], np.int32)

    with torch.no_grad():
        want = ref(torch.from_numpy(lat.transpose(0, 4, 1, 2, 3)),
                   torch.from_numpy(ts), torch.from_numpy(ehs))
    got = jax.jit(UNet3D(cfg).apply)(params, lat, ts, ehs)
    got_t = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got_t, want.numpy(), atol=1e-3, rtol=1e-3)


# --- DDIM schedule tables + step parity (epsilon AND v_prediction) -----------


@pytest.mark.parametrize("num_steps", [25, 50])
@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
def test_ddim_tables_match_torch_ref(num_steps, prediction_type):
    from tests.torch_ref import DDIMSchedulerRef

    sched = make_ddim_schedule(num_steps, prediction_type=prediction_type)
    ref = DDIMSchedulerRef(prediction_type=prediction_type)
    ref.set_timesteps(num_steps)
    np.testing.assert_array_equal(np.asarray(sched.timesteps),
                                  ref.timesteps.numpy().astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod),
        ref.alphas_cumprod[ref.timesteps].numpy().astype(np.float32),
        rtol=1e-6)


@pytest.mark.parametrize("prediction_type", ["epsilon", "v_prediction"])
def test_ddim_step_chain_parity(prediction_type):
    """Full 50-step (XL schedule) chain: jax f32 ddim_step vs the float64
    torch reference, fed identical pseudo model outputs at every step."""
    from tests.torch_ref import DDIMSchedulerRef

    num_steps = 50
    sched = make_ddim_schedule(num_steps, prediction_type=prediction_type)
    ref = DDIMSchedulerRef(prediction_type=prediction_type)
    ref.set_timesteps(num_steps)

    rng = np.random.default_rng(17)
    z = rng.normal(0, 1, (2, 3, 4, 4)).astype(np.float32)
    z_ref = torch.from_numpy(z.copy())
    z_jax = z.copy()
    worst = 0.0
    for i, t in enumerate(np.asarray(sched.timesteps)):
        # pseudo "model output" that depends on the current latent, so table
        # errors compound through the chain instead of averaging out
        mo = (0.1 * z_jax + np.float32(np.sin(int(t)))).astype(np.float32)
        z_jax = np.asarray(ddim_step(sched, i, z_jax, mo))
        mo_ref = 0.1 * z_ref + float(np.sin(int(t)))
        z_ref = ref.step(mo_ref, int(t), z_ref)
        worst = max(worst, float(np.max(np.abs(z_jax - z_ref.numpy()))))
    np.testing.assert_allclose(z_jax, z_ref.numpy(), atol=5e-4, rtol=1e-4)
    assert np.isfinite(worst)


def test_v_prediction_identities():
    """v-pred internal identities: reconstructing (x0, eps) from (z, v) and
    recombining must return z exactly; and eps/v regimes agree when the
    model outputs are consistent (v = sqrt(a) eps - sqrt(1-a) x0)."""
    num_steps = 10
    eps_sched = make_ddim_schedule(num_steps, prediction_type="epsilon")
    v_sched = make_ddim_schedule(num_steps, prediction_type="v_prediction")
    rng = np.random.default_rng(3)
    z = rng.normal(0, 1, (1, 4, 4, 2)).astype(np.float32)
    eps = rng.normal(0, 1, z.shape).astype(np.float32)
    for i in range(num_steps):
        a = float(np.asarray(eps_sched.alphas_cumprod)[i])
        x0 = (z - np.sqrt(1 - a) * eps) / np.sqrt(a)
        v = (np.sqrt(a) * eps - np.sqrt(1 - a) * x0).astype(np.float32)
        out_eps = np.asarray(ddim_step(eps_sched, i, z, eps))
        out_v = np.asarray(ddim_step(v_sched, i, z, v))
        np.testing.assert_allclose(out_eps, out_v, atol=2e-4, rtol=1e-4)
