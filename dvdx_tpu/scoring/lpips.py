"""LPIPS (AlexNet) perceptual distance — loadable real weights, JAX forward.

The reference's MD-VQS video-quality term is `1 - mean(lpips(alex))` between
consecutive frames (`/root/reference/InferNet/template/validator/scoring.py:269-309`
via the `lpips` pip package). That package = a torchvision AlexNet feature
stack + learned 1x1 "lin" calibration heads + a fixed input scaling layer.
This module is that computation in Flax, with utils.convert.convert_lpips
mapping the lpips-package state dict (`net.sliceK.*` + `linN.model.1.weight`
+ `scaling_layer.*`) onto it — drop the checkpoint in and MD-VQS scores with
the real metric. Zero egress: parity is proven against a torch re-statement
of the same architecture (tests/torch_ref.py::LPIPSRef).

Architecture (lpips 'alex'):
  scaling: x' = (x - shift) / scale   (x in [-1, 1])
  AlexNet features, taps after each ReLU:
    conv1 3->64   k11 s4 p2 | relu | maxpool k3 s2
    conv2 64->192 k5 p2     | relu | maxpool k3 s2
    conv3 192->384 k3 p1    | relu
    conv4 384->256 k3 p1    | relu
    conv5 256->256 k3 p1    | relu
  per tap: unit-normalise channels, (fa - fb)^2, 1x1 lin (non-neg weights),
  spatial mean; distance = sum over the 5 taps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

from .common import as_device_u8

# lpips ScalingLayer constants (the package hardcodes these)
LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (out_ch, kernel, stride, pad, maxpool_after)
ALEX_LAYERS = [
    (64, 11, 4, 2, True),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, False),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _normalize(x, eps=1e-10):
    return x / jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + eps)


@dataclasses.dataclass
class LPIPS:
    """params: {'convK/kernel','convK/bias' (K=0..4), 'linK' (C_k,),
    'shift' (3,), 'scale' (3,)} — produced by utils.convert.convert_lpips
    or random-initialised via LPIPS.random() for structure tests."""

    params: Any
    _jitted: Any = None
    _consec_jitted: Any = None

    @classmethod
    def random(cls, seed: int = 0) -> "LPIPS":
        rng = np.random.default_rng(seed)
        p = {"shift": LPIPS_SHIFT, "scale": LPIPS_SCALE}
        cin = 3
        for i, (cout, k, _s, _p, _mp) in enumerate(ALEX_LAYERS):
            p[f"conv{i}/kernel"] = rng.normal(
                0, (k * k * cin) ** -0.5, (k, k, cin, cout)).astype(np.float32)
            p[f"conv{i}/bias"] = np.zeros((cout,), np.float32)
            p[f"lin{i}"] = np.abs(rng.normal(0, 0.1, (cout,))).astype(np.float32)
            cin = cout
        return cls(params=jax.tree.map(jnp.asarray, p))

    def _features(self, params, x):
        """x: (N, H, W, 3) in [-1, 1] -> 5 unit-normalised taps."""
        h = (x - params["shift"]) / params["scale"]
        taps: List[jax.Array] = []
        for i, (_c, _k, s, pad, mp) in enumerate(ALEX_LAYERS):
            h = jax.lax.conv_general_dilated(
                h, params[f"conv{i}/kernel"], (s, s),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = h + params[f"conv{i}/bias"]
            h = jax.nn.relu(h)
            taps.append(_normalize(h))
            if mp:
                h = _maxpool(h)
        return taps

    def _fn(self):
        if self._jitted is None:

            def dist(params, a, b):
                fa = self._features(params, a)
                fb = self._features(params, b)
                d = jnp.zeros((a.shape[0],), jnp.float32)
                for i, (xa, xb) in enumerate(zip(fa, fb)):
                    sq = (xa - xb) ** 2                       # (N, h, w, C)
                    lin = jnp.sum(sq * params[f"lin{i}"], axis=-1)
                    d = d + jnp.mean(lin, axis=(1, 2))
                return d

            self._jitted = jax.jit(dist)
        return self._jitted

    def _consec_fn(self):
        if getattr(self, "_consec_jitted", None) is None:

            def consec(params, frames_u8):
                # uint8 -> [-1,1] ON DEVICE (the f32 frames are 4x the
                # transfer bytes; at XL they're 170 MB through the RPC
                # runtime), and features computed ONCE per frame — the
                # pairwise distance() path re-runs the AlexNet stack on the
                # F-2 interior frames twice (2x conv FLOPs for the same taps)
                f = frames_u8.astype(jnp.float32) / 127.5 - 1.0
                taps = self._features(params, f)
                d = jnp.zeros((f.shape[0] - 1,), jnp.float32)
                for i, x in enumerate(taps):
                    sq = (x[:-1] - x[1:]) ** 2
                    lin = jnp.sum(sq * params[f"lin{i}"], axis=-1)
                    d = d + jnp.mean(lin, axis=(1, 2))
                return jnp.mean(d)

            self._consec_jitted = jax.jit(consec)
        return self._consec_jitted

    def distance(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """a, b: (N, H, W, 3) f32 in [-1, 1] -> (N,) LPIPS distances."""
        return np.asarray(self._fn()(self.params, jnp.asarray(a), jnp.asarray(b)))

    def consecutive_mean(self, frames: np.ndarray) -> float:
        """mean LPIPS over consecutive frame pairs (the MD-VQS VQ input,
        reference scoring.py:269-309)."""
        if frames.shape[0] < 2:
            return 0.0
        return float(self.distance(frames[:-1], frames[1:]).mean())

    def consecutive_mean_u8(self, frames_uint8) -> float:
        """consecutive_mean from uint8 frames (numpy or device array): one
        device transfer, one feature pass per frame. Same metric as
        consecutive_mean (the u8->f32 conversion is the identical IEEE
        elementwise op, moved on-device)."""
        if frames_uint8.shape[0] < 2:
            return 0.0
        return float(self._consec_fn()(self.params,
                                       as_device_u8(frames_uint8)))
