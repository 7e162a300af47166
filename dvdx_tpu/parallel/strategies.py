"""Execution strategies = sharding configurations of one denoiser.

Reference mapping (SURVEY.md §2.1):
  single     -> legacy/baseline single-device run
  fsdp       -> strategies/fsdp.py        (param shard, full latent per rank)
  chunk      -> strategies/chunk_only.py  (replicated params, temporal chunks)
  hybrid     -> strategies/fsdp_chunked.py
  hybrid_ctx -> strategies/fsdp_chunked_coherent.py --mode hybrid_ctx (CCI)
  cp_exact   -> no reference analog: *exact* context parallelism — frame axis
                sharded with global temporal attention via XLA collectives.
                This is the idiomatic TPU upgrade of overlap blending: zero
                boundary artefacts (temp_instab = 0 by construction).

Each preset produces ONE jitted program; the mesh (data, model, seq) decides
where collectives appear: params over `model` (JIT all-gather per layer =
ZeRO-3), chunks/frames over `seq` (no comm during denoise for `chunk`/`hybrid`
— the blend's gather is the only exchange, like the reference's single
all_gather_object, but on ICI instead of pickled TCP).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import rng as rng_ops
from ..ops.scheduler import make_ddim_schedule
from ..pipelines.text2video import Pipeline, denoise
from .chunking import ChunkPlan, auto_chunk_count, blend_chunks, gather_chunks, plan_chunks
from .mesh import make_mesh
from .sharding import param_shardings


@dataclasses.dataclass(frozen=True)
class Strategy:
    """A named sharding configuration (the reference's --mode flag,
    `fsdp_chunked_coherent.py:292,303-305`)."""

    name: str
    shard_params: bool = False
    chunked: bool = False
    num_chunks: int = 0          # 0 = auto (reference auto chunk sizing)
    overlap: int = 2
    context_weight: float = 0.0  # CCI weight (reference default 0.35)
    exact_cp: bool = False
    # exact-CP collective algorithm: 'ring' (K/V ppermute, any head count),
    # 'ulysses' (head all-to-all, strict), 'auto' (ulysses where heads divide
    # the seq axis, ring elsewhere — CoCoDiff-style for short frame axes)
    cp_algo: str = "ring"
    # pre-conditioning overlap ("Strategy C"): denoise the FULL latent for
    # pre_steps before finishing independently per chunk (reference
    # `legacy/Latent Chunking/precond_overlap/run_worker.py:32-44`)
    pre_steps: int = 0


PRESETS: Dict[str, Strategy] = {
    "single": Strategy("single"),
    "fsdp": Strategy("fsdp", shard_params=True),
    "chunk": Strategy("chunk", chunked=True),
    "hybrid": Strategy("hybrid", shard_params=True, chunked=True),
    "hybrid_ctx": Strategy("hybrid_ctx", shard_params=True, chunked=True,
                           context_weight=0.35),
    "cp_exact": Strategy("cp_exact", shard_params=True, exact_cp=True),
    # same exactness, different collective: per-head single-piece softmax via
    # two all-to-alls (bitwise the single-device attention per head) instead
    # of n-1 ring hops; indivisible-head modules (level-0's 5 heads) fall
    # back to ring inside the same program
    "cp_ulysses": Strategy("cp_ulysses", shard_params=True, exact_cp=True,
                           cp_algo="auto"),
    "precond": Strategy("precond", chunked=True, pre_steps=2),
}


def get_strategy(name: str, **overrides) -> Strategy:
    if name not in PRESETS:
        raise KeyError(f"unknown strategy {name!r}; available: {sorted(PRESETS)}")
    return dataclasses.replace(PRESETS[name], **overrides) if overrides else PRESETS[name]


@dataclasses.dataclass
class StrategyRunner:
    """A compiled strategy: call .generate(seed, prompt tokens) on the host."""

    strategy: Strategy
    mesh: Mesh
    plan: Optional[ChunkPlan]
    fn: Any                      # jitted (params, token_ids, key) -> frames
    sched: Any
    num_frames: int
    height: int
    width: int

    def __call__(self, params, token_ids, noise_key):
        return self.fn(params, token_ids, noise_key)


def build_runner(
    pipe: Pipeline,
    strategy: Strategy,
    mesh: Mesh,
    *,
    num_frames: int,
    height: int,
    width: int,
    num_steps: int,
    guidance_scale: float = 7.5,
    latent_dtype=jnp.bfloat16,
    decode_group: int = 0,
    batch_size: int = 1,
) -> StrategyRunner:
    """Trace + jit one strategy for a fixed generation geometry.

    batch_size > 1 generates a batch of videos (one per fold_in(key, b)) with
    the batch sharded over the mesh `data` axis — data parallelism for
    serving throughput. Output gains a leading batch axis when > 1.
    """
    spec = pipe.spec
    ds = spec.vae.downscale
    lh, lw = height // ds, width // ds
    c = spec.latent_channels
    sched = make_ddim_schedule(num_steps, prediction_type=spec.prediction_type)
    seq = mesh.shape["seq"]

    plan = None
    if strategy.chunked:
        n = strategy.num_chunks or auto_chunk_count(num_frames, seq)
        plan = plan_chunks(num_frames, n, strategy.overlap)

    unet_apply = pipe.unet.apply
    text_apply = pipe.text_encoder.apply
    vae_apply = pipe.vae_decoder.apply
    cw = strategy.context_weight

    bsz = batch_size
    chunk_shard = NamedSharding(mesh, P(("data", "seq")))
    frame_shard = NamedSharding(mesh, P("data", "seq"))
    flat_shard = NamedSharding(mesh, P(("data", "seq")))

    def decode(vae_params, z):  # z: (B, F, lh, lw, C) f32 -> (B, F, H, W, 3)
        b, f = z.shape[0], z.shape[1]
        flat = z.reshape(b * f, lh, lw, c)
        flat = jax.lax.with_sharding_constraint(flat, flat_shard)
        g = decode_group or seq * mesh.shape["data"]
        if (b * f) % g:
            g = 1
        groups = flat.reshape((b * f) // g, g, lh, lw, c)

        def one(carry, zg):
            img = jax.vmap(lambda zz: vae_apply(vae_params, zz[None])[0])(zg)
            return carry, img

        _, imgs = jax.lax.scan(one, None, groups)
        return imgs.reshape(b, f, *imgs.shape[2:])

    def core(params, token_ids, noise_key):
        if strategy.exact_cp and seq > 1:
            # temporal attention as ring attention over the sharded frame
            # axis; frames-major spatial folds so the frame sharding stays
            # GSPMD-expressible through the (F*B, H, W, C) merges — with the
            # default batch-major fold every spatial activation would be
            # all-gathered (replicated per chip), defeating the strategy's
            # memory scaling (ops/layout.py)
            from ..ops.attention import ring_context
            from ..ops.layout import frames_major

            with ring_context(mesh, "seq", algo=strategy.cp_algo), \
                    frames_major():
                return _core_body(params, token_ids, noise_key)
        return _core_body(params, token_ids, noise_key)

    def _core_body(params, token_ids, noise_key):
        hidden, _ = text_apply(params["text"], token_ids)
        uncond, cond = hidden[0:1], hidden[1:2]
        cond_b = jnp.broadcast_to(cond, (bsz,) + cond.shape[1:])
        uncond_b = jnp.broadcast_to(uncond, (bsz,) + uncond.shape[1:])

        if bsz == 1:
            # matches the unbatched pipeline exactly (same key -> same video)
            z0_full = rng_ops.video_noise(noise_key, num_frames,
                                          (lh, lw, c), jnp.float32)[None]
        else:
            keys = jax.vmap(lambda i: jax.random.fold_in(noise_key, i))(
                jnp.arange(bsz, dtype=jnp.uint32))
            z0_full = jax.vmap(
                lambda k: rng_ops.video_noise(k, num_frames, (lh, lw, c), jnp.float32)
            )(keys)  # (B, F, lh, lw, c)
        ctx = None
        if cw > 0.0:
            ctx = jnp.mean(z0_full, axis=1, keepdims=True)  # (B,1,lh,lw,c)

        if strategy.chunked:
            z_start = z0_full.astype(latent_dtype)
            pre = min(strategy.pre_steps, num_steps)
            if pre > 0:
                # Strategy C: shared full-sequence pre-conditioning phase
                z_start = denoise(unet_apply, params["unet"], sched, z_start,
                                  cond_b, uncond_b, guidance_scale,
                                  context_latent=ctx, context_weight=cw,
                                  step_range=(0, pre))
            n = plan.num_chunks
            chunks = gather_chunks(z_start, plan)  # (B, n, L, lh, lw, c)
            z = chunks.reshape(bsz * n, plan.chunk_len, lh, lw, c)
            z = jax.lax.with_sharding_constraint(z.astype(latent_dtype), chunk_shard)
            cond_n = jnp.repeat(cond_b, n, axis=0)
            uncond_n = jnp.repeat(uncond_b, n, axis=0)
            ctx_n = jnp.repeat(ctx, n, axis=0) if ctx is not None else None
            zf = denoise(unet_apply, params["unet"], sched, z, cond_n, uncond_n,
                         guidance_scale, context_latent=ctx_n, context_weight=cw,
                         step_range=(pre, num_steps))
            zf = jax.lax.with_sharding_constraint(zf, chunk_shard)
            zf = zf.reshape(bsz, n, plan.chunk_len, lh, lw, c)
            z_final = blend_chunks(zf.astype(jnp.float32), plan)  # (B,F,...)
        else:
            z = z0_full.astype(latent_dtype)
            shard = frame_shard if strategy.exact_cp else NamedSharding(mesh, P("data"))
            z = jax.lax.with_sharding_constraint(z, shard)
            zf = denoise(unet_apply, params["unet"], sched, z, cond_b, uncond_b,
                         guidance_scale, context_latent=ctx, context_weight=cw)
            z_final = zf.astype(jnp.float32)

        out = decode(params["vae_dec"], z_final)  # (B, F, H, W, 3)
        return out if bsz > 1 else out[0]

    shardings = {
        "unet": param_shardings(pipe.params["unet"], mesh, strategy.shard_params),
        "text": param_shardings(pipe.params["text"], mesh, strategy.shard_params),
        "vae_dec": param_shardings(pipe.params["vae_dec"], mesh, strategy.shard_params),
    }
    rep = NamedSharding(mesh, P())
    fn = jax.jit(core, in_shardings=(shardings, rep, rep), out_shardings=rep)
    return StrategyRunner(strategy=strategy, mesh=mesh, plan=plan, fn=fn, sched=sched,
                          num_frames=num_frames, height=height, width=width)
