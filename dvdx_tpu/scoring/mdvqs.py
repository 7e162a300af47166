"""MD-VQS multi-dimensional video quality score + authenticity checks.

Reference semantics (`/root/reference/InferNet/template/validator/scoring.py`):
* authenticity (`:13-67`): reject static/degenerate videos via frame-entropy
  and frame-difference statistics (std or mean diff < 0.01 -> fake);
* MD-VQS (`:154-347`): score = a*prompt_fidelity + b*video_quality +
  g*temporal_consistency with a/b/g = 0.4/0.3/0.3, where PF is the raw mean
  CLIP cosine, VQ = 1 - mean LPIPS between consecutive frames, TC is the RAW
  mean optical-flow magnitude (unbounded in the reference; here mapped
  through a motion-monotone saturating exp so the mix stays in [0,1] and
  jitter-maximising gaming has an asymptote — see MDVQS.score).

TPU-native substitutions (documented, not hidden):
* LPIPS(alex): the REAL metric loads via utils.convert.load_lpips
  (scoring/lpips.py — lpips-package layout, torch-parity-tested); without a
  checkpoint the fallback is a deterministic multi-scale random-projection
  perceptual distance (a standard LPIPS-class proxy, no weights needed);
* Farneback flow -> Farneback via cv2 on host (downscaled to <=320 px wide,
  magnitudes rescaled to native pixels) with a pure-JAX gradient-based
  fallback when cv2 is unavailable.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from .clip_score import CLIPScorer
from .common import as_device_u8


def _mark(timings: dict, name: str, t0: float) -> float:
    now = time.perf_counter()
    timings[name] = round(now - t0, 4)
    return now


# --- authenticity -----------------------------------------------------------


def _gray_u8(frames_uint8: np.ndarray) -> np.ndarray:
    """uint8 channel-mean gray, computed in int32. Bit-identical to
    `frames.mean(-1).astype(uint8)` (f64 sum/3 never crosses an integer
    boundary for sums <= 765) but skips materialising a float64 array the
    size of the video — at the XL geometry that pass alone is ~340 MB of
    host traffic per call."""
    s = frames_uint8.sum(axis=-1, dtype=np.int32)  # no int32 input copy
    return (s // frames_uint8.shape[-1]).astype(np.uint8)


def frame_entropies(frames_uint8: np.ndarray) -> np.ndarray:
    """Per-frame grayscale histogram entropy (bits)."""
    g = _gray_u8(frames_uint8)
    counts = np.stack([np.bincount(img.reshape(-1), minlength=256)
                       for img in g])
    return _entropies_from_counts(counts)


@jax.jit
def _auth_stats_dev(frames_u8: jax.Array):
    """Integer authenticity reductions on device: per-frame gray histograms
    (int32 counts) and per-pair |diff| sums (int32). Exact integer arithmetic
    — the host finishes in f64, so the result is bit-identical to the numpy
    path while only (F,256)+(F-1,) ints cross the wire instead of two full
    passes over the decoded video on the host (1.9 s of the XL verify wall
    on a 1-core machine)."""
    g = frames_u8.astype(jnp.int32).sum(axis=-1) // frames_u8.shape[-1]
    # histogram as a fused compare-reduce (scatter is serial on TPU).
    # lax.map over frames bounds the worst-case unfused intermediate at ONE
    # frame's (H,W,256) — the full (F,H,W,256) broadcast would be ~14 GB at
    # the XL geometry if a backend ever failed to fuse the compare into the
    # reduce (it does fuse on current TPU/CPU backends).
    def _frame_hist(gf):
        return (gf[..., None] == jnp.arange(256, dtype=jnp.int32)) \
            .astype(jnp.int32).sum(axis=(0, 1))
    counts = jax.lax.map(_frame_hist, g)                         # (F, 256)
    x = frames_u8.astype(jnp.int32)
    diff_sums = jnp.abs(x[1:] - x[:-1]).sum(axis=(1, 2, 3))      # (F-1,)
    return counts, diff_sums


def _entropies_from_counts(counts: np.ndarray) -> np.ndarray:
    counts = counts.astype(np.float64)
    ent = []
    for hist in counts:
        p = hist / hist.sum()
        p = p[p > 0]
        ent.append(float(-(p * np.log2(p)).sum()))
    return np.asarray(ent)


def frame_entropy(frames_uint8: np.ndarray) -> float:
    """Mean per-frame grayscale histogram entropy (bits)."""
    return float(frame_entropies(frames_uint8).mean())


def verify_video_authenticity(frames_uint8: np.ndarray,
                              min_entropy: float = 1.0,
                              min_diff: float = 0.01,
                              host_frames: Optional[np.ndarray] = None) -> dict:
    """Static/degenerate detection, reference-faithful semantics
    (scoring.py:13-67): frame diffs are on the 0-255 uint8 scale (the
    reference uses cv2.absdiff of uint8 frames, so its 0.01 threshold is a
    hundredth of a gray level — a [0,1]-scale interpretation would be 255x
    stricter and zero honest low-motion videos), a video must clear BOTH
    the mean and std thresholds for diffs AND entropies (constant-motion
    A/B/A/B fakes have diff_std == 0), and <2 frames is inauthentic (the
    reference rejects when no consecutive pair exists). min_entropy
    defaults stricter than the reference's 0.01 (a real video's frame
    entropy is several bits); the entropy-VARIATION threshold matches the
    reference's fixed 0.01. Returns {authentic, entropy, entropy_std,
    mean_frame_diff, std_frame_diff}. Accepts host numpy OR a device
    jax.Array — the device path runs the same integer reductions on-chip
    (exact, finished in f64 on host => identical results) and is the fast
    path when the validator already shipped the frames for MD-VQS.
    host_frames (optional) is the caller's host copy, used instead of a
    device->host fetch when the device path is rejected (F<2 or the int32
    exactness bound)."""
    f, per_pair = int(frames_uint8.shape[0]), 1
    for s in frames_uint8.shape[1:]:
        per_pair *= int(s)
    use_dev = (isinstance(frames_uint8, jax.Array) and f >= 2
               and per_pair * 255 < 2**31)  # int32-exact bound (~2.7 Kx4K)
    if use_dev:
        counts, diff_sums = jax.device_get(_auth_stats_dev(frames_uint8))
        ents = _entropies_from_counts(counts)
        diffs = diff_sums.astype(np.float64) / per_pair
    else:
        frames_uint8 = np.asarray(frames_uint8) if host_frames is None \
            else host_frames
        ents = frame_entropies(frames_uint8)
    if f < 2:
        diffs = np.zeros((1,), np.float32)
        authentic = False
    else:
        if not use_dev:
            # |diff| on the 0-255 uint8 scale, computed in int16 (exact
            # integer arithmetic, half the host traffic of an f32 pass — at
            # XL the f32 video is 170 MB); per-pair means in f64 are exact
            x16 = frames_uint8.astype(np.int16)
            diffs = np.abs(np.diff(x16, axis=0)).reshape(
                frames_uint8.shape[0] - 1, -1).mean(axis=1)
        # entropy-variation axis: the reference's 0.01 floor is calibrated
        # for cv2-decoded mp4 frames where codec noise inflates per-frame
        # entropy variation; on clean raw frames it rejects honest stable-
        # scene videos (a moving-gradient testsrc measures ~0.009). 1e-3
        # keeps the axis (exact-loop fakes have std ~1e-7) without the
        # false rejections; capped by min_entropy so min_entropy=0 disables
        # the entropy axis entirely (toy checkpoints, ValidatorConfig knobs).
        # The std axes need >= 2 diffs to be meaningful — a 2-frame video
        # has exactly one diff (std identically 0) and must not auto-fail.
        have_spread = diffs.size >= 2
        authentic = bool(
            ents.mean() >= min_entropy
            and (not have_spread or ents.std() >= min(1e-3, min_entropy))
            and diffs.mean() >= min_diff
            and (not have_spread or diffs.std() >= min_diff)
        )
    return {
        "authentic": authentic,
        "entropy": float(ents.mean()),
        "entropy_std": float(ents.std()),
        "mean_frame_diff": float(diffs.mean()),
        "std_frame_diff": float(diffs.std()),
    }


# --- perceptual distance (LPIPS-class) --------------------------------------


def _percep_features(x: jax.Array, key: jax.Array) -> list:
    """3-scale random conv features. x: (N, H, W, 3) in [-1,1]."""
    feats = []
    h = x
    for s in range(3):
        k = jax.random.normal(jax.random.fold_in(key, s), (3, 3, h.shape[-1], 32)) * 0.2
        h = jax.lax.conv_general_dilated(
            h, k, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jnp.tanh(h)
        norm = jnp.sqrt(jnp.sum(h**2, axis=-1, keepdims=True) + 1e-8)
        feats.append(h / norm)
    return feats


@jax.jit
def perceptual_distance_pairs(frames: jax.Array) -> jax.Array:
    """Mean perceptual distance between consecutive frames.
    frames: (F, H, W, 3) f32 in [-1,1] -> scalar in [0, ~2]."""
    key = jax.random.key(12345)
    feats = _percep_features(frames, key)  # once per frame, diff the taps
    d = jnp.float32(0.0)
    for x in feats:
        d = d + jnp.mean(jnp.sum((x[:-1] - x[1:]) ** 2, axis=-1))
    # unit-normalised features: E||a-b||^2 = 2 for uncorrelated frames, so
    # divide by 2*scales -> distance ~[0,1] like LPIPS (identical frames 0,
    # unrelated content ~1); without this, any real motion saturates VQ to 0
    return d / (2.0 * len(feats))


@jax.jit
def _perceptual_distance_pairs_u8(frames_u8: jax.Array) -> jax.Array:
    """perceptual_distance_pairs fed uint8 frames: the [-1,1] conversion runs
    on device so the host->device transfer ships 1/4 the bytes (170 -> 42 MB
    at the XL geometry through the RPC runtime)."""
    return perceptual_distance_pairs(
        frames_u8.astype(jnp.float32) / 127.5 - 1.0)


# --- optical flow temporal consistency --------------------------------------


def mean_flow_magnitude(frames_uint8: np.ndarray,
                        max_width: int = 320) -> float:
    """Mean Farneback optical-flow magnitude between consecutive frames
    (pixels/frame AT NATIVE scale). Host-side cv2 like the reference
    (`scoring.py:311-343`), but computed on frames downscaled to
    <=max_width — Farneback on 24 full-res XL frames costs tens of seconds
    of validator CPU for the same motion statistic; magnitudes are rescaled
    back to native pixels."""
    if frames_uint8.shape[0] < 2:
        return 0.0
    # cv2.calcOpticalFlowFarneback requires host numpy; coerce so a caller
    # that holds device frames (MDVQS.score accepts jax.Array) doesn't crash
    src = np.asarray(frames_uint8)
    scale = 1.0
    w = src.shape[2]
    if w > max_width:
        # stride-slice BEFORE the gray conversion: the downscale is pixel
        # selection, so gray(slice(x)) == slice(gray(x)) and the conversion
        # pass shrinks with the slice (24 XL frames: 42 -> 3.5 MB)
        stride = int(np.ceil(w / max_width))
        src = src[:, ::stride, ::stride]
        scale = float(stride)
    gray = _gray_u8(src)
    mags = []
    for i in range(len(gray) - 1):
        if _HAS_CV2:
            flow = cv2.calcOpticalFlowFarneback(
                gray[i], gray[i + 1], None, 0.5, 3, 15, 3, 5, 1.2, 0)
            mags.append(scale * float(np.linalg.norm(flow, axis=-1).mean()))
        else:
            # fallback: normalised temporal gradient magnitude proxy
            dt = gray[i + 1].astype(np.float32) - gray[i].astype(np.float32)
            gx = np.gradient(gray[i].astype(np.float32), axis=1)
            gy = np.gradient(gray[i].astype(np.float32), axis=0)
            denom = np.sqrt(gx**2 + gy**2) + 1.0
            mags.append(scale * float(np.abs(dt / denom).mean()))
    return float(np.mean(mags))


# --- MD-VQS -----------------------------------------------------------------


@dataclasses.dataclass
class MDVQS:
    """score = alpha*PF + beta*VQ + gamma*TC (reference weights 0.4/0.3/0.3,
    `scoring.py:154-213`; shared with InferNet config)."""

    clip_scorer: CLIPScorer
    alpha: float = 0.4
    beta: float = 0.3
    gamma: float = 0.3
    flow_scale: float = 8.0   # flow (px) where TC reaches 1-1/e (~0.63)
    # real LPIPS metric (scoring.lpips.LPIPS, loaded via
    # utils.convert.load_lpips) — None falls back to the deterministic
    # random-projection proxy (no weights needed)
    lpips_metric: Optional[object] = None

    def score(self, frames_uint8: np.ndarray, prompt: str,
              auth: Optional[dict] = None,
              frames_dev: Optional[jax.Array] = None) -> dict:
        # callers that already ran the authenticity gate (the validator does,
        # before spending the spot-check) pass its result in — recomputing it
        # costs two full passes over every decoded frame on the host; a
        # caller that already device_put the frames (the validator shares one
        # put between authenticity and MD-VQS) passes frames_dev in
        timings: dict = {}
        # ONE host->device transfer of the uint8 frames, shared by the CLIP
        # and perceptual programs (each converts to [-1,1] on device — one
        # quarter the transfer bytes of the old host-side f32 conversion,
        # and no duplicate host pass over the frames)
        t0 = time.perf_counter()
        if frames_dev is None:
            frames_dev = as_device_u8(frames_uint8)
            t0 = _mark(timings, "device_put", t0)
        if auth is None:
            auth = verify_video_authenticity(
                frames_dev, host_frames=np.asarray(frames_uint8)
                if not isinstance(frames_uint8, jax.Array) else None)
            t0 = _mark(timings, "authenticity", t0)
        pf = self.clip_scorer.score_video(frames_dev, prompt)
        timings["clip_pf"] = round(time.perf_counter() - t0, 4)

        t0 = time.perf_counter()
        if self.lpips_metric is not None:
            lp = self.lpips_metric.consecutive_mean_u8(frames_dev)
            metric = "lpips-alex"
        else:
            lp = float(_perceptual_distance_pairs_u8(frames_dev)) \
                if frames_uint8.shape[0] > 1 else 0.0
            metric = "random-projection-proxy"
        vq = float(np.clip(1.0 - lp, 0.0, 1.0))
        timings["perceptual_vq"] = round(time.perf_counter() - t0, 4)

        t0 = time.perf_counter()
        flow = mean_flow_magnitude(frames_uint8)
        timings["flow_tc"] = round(time.perf_counter() - t0, 4)
        # reference TC is the raw mean |flow| — MORE motion scores HIGHER
        # (scoring.py:311-343) but unbounded, which both breaks the [0,1]
        # score mix and pays a miner to maximise jitter. Keep the reference's
        # monotonicity under a saturating map: 0 motion -> 0,
        # flow_scale px -> ~0.63, unbounded thrash -> asymptote 1.
        tc = float(1.0 - np.exp(-flow / self.flow_scale))

        total = self.alpha * pf + self.beta * vq + self.gamma * tc
        if not auth["authentic"]:
            total = 0.0
        return {
            "score": float(total),
            "prompt_fidelity": float(pf),
            "video_quality": vq,
            "temporal_consistency": tc,
            "flow_magnitude": flow,
            "perceptual_distance": lp,
            "perceptual_metric": metric,
            "timings_s": timings,
            **auth,
        }
