"""Text -> video latent-diffusion pipeline (single logical device view).

The distributed strategies in ``dvdx_tpu.parallel`` reuse exactly these pure
functions under different shardings — one denoiser, many meshes — instead of
the reference's four divergent strategy scripts
(`/root/reference/Distribution/strategies/{fsdp,chunk_only,fsdp_chunked,
fsdp_chunked_coherent}.py`).

Determinism contract (Proof-of-Inference): given (params, seed, prompt tokens,
schedule, guidance), every array this module produces is a pure function of its
inputs; recorded (z_t, eps_t) pairs are the Merkle leaves the miner commits to
(`/root/reference/InferNet/neurons/miner.py:571-589,631-636`).

Performance note: jitted generators are cached per generation geometry on the
Pipeline object and take params explicitly, so parameter swaps (resharding,
perturbation) never invalidate traces.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.dit_video import VideoDiT, init_dit_params
from ..models.text_encoder import CLIPTextEncoder, init_text_params, tokenize_batch
from ..models.unet3d import UNet3D, init_unet_params
from ..models.vae import VAEDecoder, decode_frames_tiled
from ..models.zoo import ModelSpec, get_model_spec
from ..ops import rng as rng_ops
from ..ops.scheduler import DDIMSchedule, ddim_step, make_ddim_schedule


@dataclasses.dataclass
class Pipeline:
    """Bundle of model defs + params. Params are plain pytrees so the parallel
    layer can re-shard them without touching this class."""

    spec: ModelSpec
    unet: object        # the denoiser module: UNet3D or VideoDiT (same API)
    text_encoder: CLIPTextEncoder
    vae_decoder: VAEDecoder
    params: Dict[str, Any]
    # real CLIP BPE tokenizer (models/tokenizer.py) when the pipeline was
    # built from a diffusers checkpoint; None -> deterministic hash tokenizer
    tokenizer: Optional[object] = None
    _gen_cache: Dict[tuple, Any] = dataclasses.field(default_factory=dict)

    @property
    def latent_channels(self) -> int:
        return self.spec.latent_channels

    def tokenize(self, texts: List[str]) -> np.ndarray:
        """Prompts -> (B, max_length) int32 ids. Part of the PoI determinism
        chain: miner and validator must hold the same tokenizer (both load it
        from the same checkpoint; the hash fallback is parameter-free)."""
        if self.tokenizer is not None:
            return self.tokenizer(texts, max_length=self.spec.text.max_length)
        return tokenize_batch(texts, self.spec.text.vocab_size,
                              self.spec.text.max_length)

    def generator(self, num_frames: int, height: int, width: int, num_steps: int,
                  guidance_scale: float, context_weight: float, record: bool,
                  cfg_split: bool = False):
        """Jitted (params, token_ids, noise_key) -> frames [, zs, epss]."""
        key = (num_frames, height, width, num_steps, float(guidance_scale),
               float(context_weight), bool(record), bool(cfg_split))
        if key not in self._gen_cache:
            sched = make_ddim_schedule(num_steps,
                                       prediction_type=self.spec.prediction_type)
            fn = functools.partial(
                generate_core, self.spec, self.unet.apply, self.text_encoder.apply,
                self.vae_decoder.apply, sched=sched, num_frames=num_frames,
                height=height, width=width, guidance_scale=guidance_scale,
                context_weight=context_weight, record=record, cfg_split=cfg_split,
            )
            self._gen_cache[key] = (jax.jit(fn), sched)
        return self._gen_cache[key]


def build_pipeline(model_name: str = "zeroscope-tiny", seed: int = 0,
                   params_dtype=None) -> Pipeline:
    """Random-init pipeline for a registered model family (host-side init).

    params_dtype: storage dtype for float parameters. Defaults to the family's
    compute dtype — bf16-compute models store bf16 params (halves HBM
    residency; inference needs no master copies). Deterministic: every host
    derives identical bf16 weights from the seed (f32 init -> one cast)."""
    spec = get_model_spec(model_name)
    if params_dtype is None:
        params_dtype = spec.denoiser_config.compute_dtype
    if spec.kind == "dit":
        unet = VideoDiT(spec.dit)
    else:
        unet = UNet3D(spec.unet)
    text = CLIPTextEncoder(spec.text)
    vae_dec = VAEDecoder(spec.vae)

    host = _cached_host_params(spec, model_name, seed, params_dtype)
    # ONE batched device transfer: per-leaf device ops during init are
    # synchronous round-trips on remote-device runtimes (minutes of
    # cold-start for the 1.4B UNet)
    params = jax.device_put(host)
    return Pipeline(spec=spec, unet=unet, text_encoder=text, vae_decoder=vae_dec, params=params)


def _init_scheme_tag(spec) -> str:
    """Cache-key component that changes whenever the derivation identity
    changes: hash of utils/init's SOURCE (any rule edit self-invalidates old
    caches — a silent stale hit would hand miner and validator bitwise-
    different weights and flag honest miners as cheats) + the model spec
    repr (shape-preserving config changes included)."""
    import hashlib
    import inspect

    from ..utils import init as _init_mod

    h = hashlib.sha256()
    h.update(inspect.getsource(_init_mod).encode())
    h.update(repr(spec).encode())
    return h.hexdigest()[:12]


def _cached_host_params(spec, model_name: str, seed: int, params_dtype):
    """Host param tree for (model, seed, dtype), with an optional flat-npz
    disk cache (DVDX_PARAM_CACHE=<dir>): reloading 1.7 GB beats re-deriving
    1.4B Gaussians (~40 s on a small host). Cache content is exactly the
    derived tree, so determinism (and PoI weight identity) is unchanged."""
    import os

    from ..utils.init import fast_init

    cache_dir = os.environ.get("DVDX_PARAM_CACHE", "")
    cache_path = None
    if cache_dir:
        dt = jnp.dtype(params_dtype).name
        cache_path = os.path.join(
            cache_dir,
            f"{model_name}-s{seed}-{dt}-{_init_scheme_tag(spec)}.npz")
        if os.path.exists(cache_path):
            try:
                return _load_flat_npz(cache_path)
            except Exception:
                pass  # corrupt/partial cache -> rebuild below

    ik = dict(dtype=params_dtype, device_put=False)
    if spec.kind == "dit":
        denoiser_params = init_dit_params(spec.dit, seed=seed, **ik)
    else:
        denoiser_params = init_unet_params(spec.unet, seed=seed, **ik)
    host = {
        "unet": denoiser_params,
        "text": init_text_params(spec.text, seed=seed + 1, **ik),
        "vae_dec": fast_init(
            VAEDecoder(spec.vae), seed + 2,
            jnp.zeros((1, 8, 8, spec.vae.latent_channels), jnp.float32),
            **ik,
        ),
    }
    if cache_path:
        try:
            _save_flat_npz(cache_path, host)
        except Exception:
            pass
    return host


def _save_flat_npz(path: str, tree):
    """Flat npz of host leaves; ml_dtypes (bf16) stored as raw-byte views
    with the dtype name in the key (npz itself can't describe bf16)."""
    import os

    flat = {}

    def walk(t, prefix=""):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            a = np.asarray(t)
            flat[f"{prefix}|{a.dtype.name}|{','.join(map(str, a.shape))}"] = (
                a.view(np.uint8))

    walk(tree)
    import tempfile

    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    # unique temp per writer: concurrent cold-starting processes (miner +
    # validator on one host) must not interleave into one tmp file
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _load_flat_npz(path: str):
    import ml_dtypes  # noqa: F401  (registers bf16 et al. with numpy)

    tree: dict = {}
    with np.load(path) as z:
        for key in z.files:
            name, dtype_name, shape_s = key.rsplit("|", 2)
            shape = tuple(int(x) for x in shape_s.split(",") if x)
            arr = z[key].view(np.dtype(dtype_name)).reshape(shape)
            node = tree
            parts = name.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = arr
    return tree


def resolve_pipeline(name_or_dir: str, seed: int = 0) -> Pipeline:
    """Registry name -> random-init pipeline; a diffusers checkpoint
    directory (has model_index.json or unet/config.json) -> pretrained
    pipeline via utils.convert.load_diffusers_checkpoint. Lets every CLI
    (`--model`) accept either — the reference's `from_pretrained` ergonomics."""
    import os

    if os.path.isdir(name_or_dir) and (
            os.path.exists(os.path.join(name_or_dir, "model_index.json"))
            or os.path.exists(os.path.join(name_or_dir, "unet", "config.json"))):
        from ..utils.convert import load_diffusers_checkpoint

        return load_diffusers_checkpoint(name_or_dir)
    return build_pipeline(name_or_dir, seed=seed)


def encode_prompts(pipe: Pipeline, prompts: List[str]) -> jax.Array:
    """Prompts -> encoder hidden states (B, S, D)."""
    ids = pipe.tokenize(prompts)
    hidden, _ = jax.jit(pipe.text_encoder.apply)(pipe.params["text"], jnp.asarray(ids))
    return hidden


def cfg_denoise_step(
    unet_apply,
    unet_params,
    sched: DDIMSchedule,
    z: jax.Array,
    step_index: jax.Array,
    cond: jax.Array,
    uncond: jax.Array,
    guidance_scale: float,
    frame_positions: Optional[jax.Array] = None,
    context_latent: Optional[jax.Array] = None,
    context_weight: float = 0.0,
    cfg_split: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One classifier-free-guidance denoise step. Returns (z_prev, eps_guided).

    Mirrors the reference hot loop (`fsdp.py:139-153`): duplicate latent for
    [uncond, cond], optionally add the CCI global-context latent to the model
    *input* (`fsdp_chunked_coherent.py:134-137`), guide, then DDIM-update.

    cfg_split=True runs the uncond and cond branches as two sequential UNet
    calls instead of one 2B batch — halves peak activation memory (the XL
    1024x576 geometry needs this on a single 16 GB chip) at slightly lower
    MXU occupancy. Bit-different program from the batched path, so prover and
    verifier must agree on the flag (it is part of the step-program identity).
    """
    t = jnp.asarray(sched.timesteps)[step_index]
    b = z.shape[0]
    x = z
    if context_latent is not None and context_weight > 0.0:
        ctx_lat = context_latent.astype(z.dtype)
        x = z + jnp.asarray(context_weight, z.dtype) * ctx_lat
    ts = jnp.full((b,), t, jnp.int32)
    if cfg_split:
        eps_u = unet_apply(unet_params, x, ts, uncond, frame_positions)
        eps_c = unet_apply(unet_params, x, ts, cond, frame_positions)
    else:
        x2 = jnp.concatenate([x, x], axis=0)
        ctx = jnp.concatenate([uncond, cond], axis=0)
        ts2 = jnp.concatenate([ts, ts], axis=0)
        eps_pair = unet_apply(unet_params, x2, ts2, ctx, frame_positions)
        eps_u, eps_c = jnp.split(eps_pair, 2, axis=0)
    eps = eps_u + jnp.asarray(guidance_scale, eps_u.dtype) * (eps_c - eps_u)
    z_prev = ddim_step(sched, step_index, z, eps)
    return z_prev, eps


def denoise(
    unet_apply,
    unet_params,
    sched: DDIMSchedule,
    z0: jax.Array,
    cond: jax.Array,
    uncond: jax.Array,
    guidance_scale: float,
    frame_positions: Optional[jax.Array] = None,
    context_latent: Optional[jax.Array] = None,
    context_weight: float = 0.0,
    record: bool = False,
    step_range: Optional[Tuple[int, int]] = None,
    cfg_split: bool = False,
):
    """Denoise loop as lax.scan over steps [a, b) of the schedule
    (default: all). z0: (B, F, h, w, C).

    step_range enables partial denoising — used by the pre-conditioning
    overlap strategy (reference 'Strategy C',
    `legacy/Latent Chunking/precond_overlap/run_worker.py:32-44`) which
    denoises the full latent for pre_steps before finishing per-chunk.

    record=True additionally returns (z_t, eps_t) per step — the Proof-of-
    Inference leaves (z stacked pre-update, as `miner.py:571-589` records).
    """

    def body(z, step_index):
        z_prev, eps = cfg_denoise_step(
            unet_apply, unet_params, sched, z, step_index, cond, uncond,
            guidance_scale, frame_positions, context_latent, context_weight,
            cfg_split=cfg_split,
        )
        out = (z, eps) if record else None
        return z_prev, out

    a, b = step_range if step_range is not None else (0, sched.num_steps)
    steps = jnp.arange(a, b)
    z_final, recs = jax.lax.scan(body, z0, steps)
    if record:
        return z_final, recs[0], recs[1]
    return z_final


def generate_core(
    spec: ModelSpec,
    unet_apply,
    text_apply,
    vae_apply,
    params: Dict[str, Any],
    token_ids: jax.Array,          # (2, S): [negative, prompt]
    noise_key: jax.Array,          # jax PRNG key (from ops.rng.base_key(seed))
    *,
    sched: DDIMSchedule,
    num_frames: int,
    height: int,
    width: int,
    guidance_scale: float,
    context_weight: float = 0.0,
    record: bool = False,
    latent_dtype=jnp.bfloat16,
    cfg_split: bool = False,
):
    """Pure jittable core: tokens + seed -> decoded frames (F, H, W, 3) f32.

    The whole body lives in one trace: text encode, base-noise synthesis,
    scan'd denoise, per-frame VAE decode.
    """
    ds = spec.vae.downscale
    lh, lw = height // ds, width // ds
    c = spec.latent_channels

    hidden, _ = text_apply(params["text"], token_ids)
    uncond, cond = hidden[0:1], hidden[1:2]

    z0 = rng_ops.video_noise(noise_key, num_frames, (lh, lw, c), dtype=jnp.float32)
    ctx = None
    if context_weight > 0.0:
        # CCI: global context = time-mean of the base noise (reference
        # fsdp_chunked_coherent.py:105-127, rank-0 broadcast -> here a pure fn)
        ctx = jnp.mean(z0, axis=0, keepdims=True)[None]  # (1, 1, lh, lw, c)
    z0 = z0[None].astype(latent_dtype)  # (1, F, lh, lw, C)

    out = denoise(
        unet_apply, params["unet"], sched, z0, cond, uncond,
        guidance_scale, context_latent=ctx, context_weight=context_weight,
        record=record, cfg_split=cfg_split,
    )
    if record:
        z_final, zs, epss = out
    else:
        z_final = out

    frames = decode_frames_tiled(vae_apply, params["vae_dec"],
                                 z_final[0].astype(jnp.float32))
    if record:
        return frames, zs, epss
    return frames


def build_segmented_runner(
    pipe: Pipeline,
    *,
    num_frames: int,
    height: int,
    width: int,
    num_steps: int,
    guidance_scale: float = 7.5,
    segment_steps: int = 10,
    cfg_split: bool = False,
    latent_dtype=jnp.bfloat16,
    decode_tile: int = 0,
):
    """Generation split into bounded device launches.

    One jitted program covers `segment_steps` denoise steps with a *traced*
    start offset, so the host loop reuses a single compilation. Motivation:
    very long single executions (XL 50-step scans, minutes of device time)
    can exceed runtime RPC limits and preclude progress reporting; segments
    bound per-launch wall time with negligible dispatch overhead. Numerics
    are identical to the fused scan (same step program, same order).

    Returns run(params, token_ids, noise_key) -> frames (F, H, W, 3) f32.
    """
    spec = pipe.spec
    ds = spec.vae.downscale
    lh, lw = height // ds, width // ds
    c = spec.latent_channels
    sched = make_ddim_schedule(num_steps, prediction_type=spec.prediction_type)

    enc = jax.jit(lambda p, ids: pipe.text_encoder.apply(p["text"], ids)[0])
    noise = jax.jit(lambda k: rng_ops.video_noise(k, num_frames, (lh, lw, c),
                                                  jnp.float32))
    dec = jax.jit(lambda p, z: decode_frames_tiled(
        pipe.vae_decoder.apply, p["vae_dec"], z.astype(jnp.float32),
        tile=decode_tile, upscale=ds))

    seg_cache: Dict[int, Any] = {}

    def seg_fn(length: int):
        if length not in seg_cache:
            def seg(params, z, cond, uncond, start):
                def body(z, i):
                    z2, _ = cfg_denoise_step(
                        pipe.unet.apply, params["unet"], sched, z, start + i,
                        cond, uncond, guidance_scale, cfg_split=cfg_split)
                    return z2, None
                z, _ = jax.lax.scan(body, z, jnp.arange(length))
                return z

            seg_cache[length] = jax.jit(seg)
        return seg_cache[length]

    def run(params, token_ids, noise_key):
        hidden = enc(params, token_ids)
        uncond, cond = hidden[0:1], hidden[1:2]
        z = noise(noise_key)[None].astype(latent_dtype)
        start = 0
        while start < num_steps:
            length = min(segment_steps, num_steps - start)
            z = seg_fn(length)(params, z, cond, uncond, jnp.int32(start))
            start += length
        return dec(params, z[0])

    return run


def generate(
    pipe: Pipeline,
    prompt: str,
    *,
    negative_prompt: str = "",
    seed: int = 0,
    num_frames: Optional[int] = None,
    height: Optional[int] = None,
    width: Optional[int] = None,
    num_steps: Optional[int] = None,
    guidance_scale: Optional[float] = None,
    context_weight: float = 0.0,
    record: bool = False,
    cfg_split: bool = False,
):
    """User-facing generation. Returns frames as uint8 (F, H, W, 3) ndarray,
    plus (zs, epss, timesteps) when record=True. cfg_split trades a little
    MXU occupancy for half the activation memory (XL geometry on one chip)."""
    spec = pipe.spec
    num_frames = num_frames or spec.default_frames
    height = height or spec.default_height
    width = width or spec.default_width
    num_steps = num_steps or spec.default_steps
    if guidance_scale is None:
        guidance_scale = spec.default_guidance_scale

    fn, sched = pipe.generator(num_frames, height, width, num_steps,
                               guidance_scale, context_weight, record,
                               cfg_split=cfg_split)
    ids = pipe.tokenize([negative_prompt, prompt])
    out = fn(pipe.params, jnp.asarray(ids), rng_ops.base_key(seed))
    if record:
        frames, zs, epss = out
    else:
        frames = out
    video = np.asarray(((frames + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8))
    if record:
        return video, (np.asarray(zs), np.asarray(epss), np.asarray(sched.timesteps))
    return video
