"""Strategy/sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdx_tpu.ops import rng as rng_ops
from dvdx_tpu.parallel.chunking import (
    auto_chunk_count,
    blend_chunks,
    gather_chunks,
    plan_chunks,
)
from dvdx_tpu.parallel.mesh import make_mesh
from dvdx_tpu.parallel.sharding import param_shardings, sharded_size_per_device
from dvdx_tpu.parallel.strategies import build_runner, get_strategy
from dvdx_tpu.models.text_encoder import tokenize_batch


def test_plan_chunks_cover_all_frames():
    for nf, nc, ov in [(16, 4, 2), (16, 1, 2), (25, 5, 3), (8, 8, 1)]:
        plan = plan_chunks(nf, nc, ov)
        covered = np.unique(plan.frame_index)
        np.testing.assert_array_equal(covered, np.arange(nf))
        assert plan.weights.shape == plan.frame_index.shape
        assert plan.weights.min() > 0


def test_blend_is_partition_of_unity():
    """Blending chunks of a constant video must return the constant —
    guarantees the ramp weights normalise correctly."""
    plan = plan_chunks(16, 4, 2)
    x = jnp.ones((1, 16, 4, 4, 2)) * 3.5
    chunks = gather_chunks(x, plan)
    out = blend_chunks(chunks, plan)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-6)


def test_blend_roundtrip_identity_single_chunk():
    plan = plan_chunks(8, 1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 2, 2, 4)).astype(np.float32))
    out = blend_chunks(gather_chunks(x, plan), plan)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


def test_auto_chunk_count_divisible():
    for shards in [1, 2, 4, 8]:
        n = auto_chunk_count(64, shards)
        assert n % shards == 0


def test_param_shardings_shapes():
    mesh = make_mesh((1, 4, 2))
    params = {"a": jnp.zeros((256, 128)), "b": jnp.zeros((3,))}
    sh = param_shardings(params, mesh, shard=True)
    assert sh["a"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["b"].spec == jax.sharding.PartitionSpec()
    # sharded bytes: big param divided by 4, small replicated
    per_dev = sharded_size_per_device(params, mesh, shard=True)
    assert per_dev == 256 * 128 * 4 // 4 + 3 * 4


@pytest.mark.parametrize("name,mesh_shape", [
    ("chunk", (1, 1, 8)),
    ("fsdp", (1, 8, 1)),
    ("hybrid_ctx", (1, 2, 4)),
    ("cp_exact", (1, 2, 4)),
])
def test_strategies_run_on_mesh(tiny_pipeline, name, mesh_shape):
    pipe = tiny_pipeline
    mesh = make_mesh(mesh_shape)
    strat = get_strategy(name)
    runner = build_runner(pipe, strat, mesh, num_frames=8, height=32, width=32,
                          num_steps=2, guidance_scale=7.5)
    ids = tokenize_batch(["", "a city street"], pipe.spec.text.vocab_size,
                         pipe.spec.text.max_length)
    frames = runner(pipe.params, jnp.asarray(ids), rng_ops.base_key(5))
    assert frames.shape == (8, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(frames)))


def test_chunk_strategy_matches_singlechunk_semantics(tiny_pipeline):
    """One chunk == unchunked denoise: the chunked program with n=1 must equal
    the plain path bit-for-bit (same trace modulo gather/blend identity)."""
    pipe = tiny_pipeline
    mesh = make_mesh((1, 1, 1), devices=[jax.devices()[0]])
    ids = jnp.asarray(tokenize_batch(["", "x"], pipe.spec.text.vocab_size,
                                     pipe.spec.text.max_length))
    key = rng_ops.base_key(3)
    single = build_runner(pipe, get_strategy("single"), mesh, num_frames=4,
                          height=32, width=32, num_steps=2)
    chunk1 = build_runner(pipe, get_strategy("chunk", num_chunks=1), mesh,
                          num_frames=4, height=32, width=32, num_steps=2)
    a = np.asarray(single(pipe.params, ids, key))
    b = np.asarray(chunk1(pipe.params, ids, key))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_cp_exact_matches_single_device(tiny_pipeline):
    """Exact context parallelism is NOT an approximation: frame-sharded
    denoise with ring temporal attention must match the single-device result
    (up to f32 accumulation-order noise) — unlike chunked modes, which trade
    exactness for independence (measured via temp_instab)."""
    pipe = tiny_pipeline
    ids = jnp.asarray(tokenize_batch(["", "a waterfall"], pipe.spec.text.vocab_size,
                                     pipe.spec.text.max_length))
    key = rng_ops.base_key(9)
    single = build_runner(pipe, get_strategy("single"),
                          make_mesh((1, 1, 1), devices=[jax.devices()[0]]),
                          num_frames=8, height=32, width=32, num_steps=2)
    cp = build_runner(pipe, get_strategy("cp_exact", shard_params=False),
                      make_mesh((1, 1, 8)),
                      num_frames=8, height=32, width=32, num_steps=2)
    a = np.asarray(single(pipe.params, ids, key), np.float32)
    b = np.asarray(cp(pipe.params, ids, key), np.float32)
    np.testing.assert_allclose(a, b, atol=3e-2)  # decoded-pixel scale [-1,1]


def test_cp_exact_hf_family_uses_ring(tiny_hf_pipeline):
    """The diffusers-faithful temporal path (_FrameAxisAttention) must also
    dispatch to ring attention under cp_exact — without the ring_active()
    branch it silently degrades to GSPMD all-gathers of K/V over frames
    (correct but unscalable; caught via HBM analysis, round 2)."""
    pipe = tiny_hf_pipeline
    ids = jnp.asarray(tokenize_batch(["", "a waterfall"], pipe.spec.text.vocab_size,
                                     pipe.spec.text.max_length))
    key = rng_ops.base_key(9)
    single = build_runner(pipe, get_strategy("single"),
                          make_mesh((1, 1, 1), devices=[jax.devices()[0]]),
                          num_frames=8, height=32, width=32, num_steps=2)
    cp = build_runner(pipe, get_strategy("cp_exact", shard_params=False),
                      make_mesh((1, 1, 8)),
                      num_frames=8, height=32, width=32, num_steps=2)
    # the ring path must actually be in the compiled program: exact CP shows
    # up as collective-permute (ppermute ring steps) in the SPMD module
    hlo = cp.fn.lower(pipe.params, ids, key).compile().as_text()
    assert "collective-permute" in hlo
    a = np.asarray(single(pipe.params, ids, key), np.float32)
    b = np.asarray(cp(pipe.params, ids, key), np.float32)
    np.testing.assert_allclose(a, b, atol=3e-2)  # decoded-pixel scale [-1,1]


def test_cp_exact_shards_spatial_activations(tiny_hf_pipeline):
    """The frames-major spatial fold (ops/layout.py) must keep the frame
    sharding alive through the (F*B, H, W, C) merges: with the batch-major
    fold the merged dim is interleaved-sharded (inexpressible), GSPMD
    all-gathers, and every spatial activation is replicated per chip — the
    ~11.7 GB/chip cp_exact residual found in round 2 (docs/PERF_NOTES.md).
    Regression check: cp_exact per-device temp reservation stays well below
    the single-device program's."""
    pipe = tiny_hf_pipeline
    ids = jnp.asarray(tokenize_batch(["", "memory"], pipe.spec.text.vocab_size,
                                     pipe.spec.text.max_length))
    key = rng_ops.base_key(0)

    def temp_mb(runner):
        ma = runner.fn.lower(pipe.params, ids, key).compile().memory_analysis()
        return ma.temp_size_in_bytes / 2**20

    single = build_runner(pipe, get_strategy("single"),
                          make_mesh((1, 1, 1), devices=[jax.devices()[0]]),
                          num_frames=16, height=32, width=32, num_steps=2)
    cp = build_runner(pipe, get_strategy("cp_exact", shard_params=False),
                      make_mesh((1, 1, 8)),
                      num_frames=16, height=32, width=32, num_steps=2)
    base, sharded = temp_mb(single), temp_mb(cp)
    # 8-way frame sharding: perfect scaling would be 12.5%; ring-attention
    # buffers, per-frame-invariant buffers and the f32 blend keep it above
    # that, but the replicated regression was ~100% — assert the sharded
    # program stays under half the single-device reservation
    assert sharded < 0.5 * base, (sharded, base)


def test_batched_generation_over_data_axis(tiny_pipeline):
    """batch_size > 1 shards videos over the mesh `data` axis (DP serving)."""
    pipe = tiny_pipeline
    mesh = make_mesh((2, 1, 4))
    runner = build_runner(pipe, get_strategy("hybrid_ctx"), mesh, num_frames=8,
                          height=32, width=32, num_steps=2, batch_size=4)
    ids = jnp.asarray(tokenize_batch(["", "four videos"], pipe.spec.text.vocab_size,
                                     pipe.spec.text.max_length))
    out = runner(pipe.params, ids, rng_ops.base_key(2))
    assert out.shape == (4, 8, 32, 32, 3)
    vids = np.asarray(out)
    assert np.all(np.isfinite(vids))
    # distinct seeds per batch element -> distinct videos
    assert not np.array_equal(vids[0], vids[1])


def test_measure_gather_s_excludes_fetch_barrier():
    """ici_gather_s must time the stitch collective, not the forced host
    fetch (VERDICT r3 weak 6). On the CPU mesh block_until_ready IS a
    reliable barrier, so cross-validate the subtracted measurement against
    an independent blocked timing of the same gather program."""
    import time

    from jax.sharding import NamedSharding, PartitionSpec as P

    from dvdx_tpu.parallel.runner import measure_gather_s

    mesh = make_mesh((1, 1, 8))
    shape = (8, 4, 32, 32, 4)
    dt, recv = measure_gather_s(mesh, shape, jnp.bfloat16, reps=5)
    assert dt >= 0.0
    nbytes = int(np.prod(shape)) * 2
    assert recv == nbytes * 7 // 8

    # independent ground truth: block_until_ready timing (trustworthy on CPU)
    repl = NamedSharding(mesh, P())
    x = jax.device_put(jnp.zeros(shape, jnp.bfloat16),
                       NamedSharding(mesh, P(("data", "seq"))))
    gather = jax.jit(lambda a: jax.lax.with_sharding_constraint(a, repl),
                     out_shardings=repl)
    jax.block_until_ready(gather(x))
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(gather(x))
    blocked = (time.perf_counter() - t0) / 5

    # the subtracted collective time must not EXCEED the full blocked dispatch
    # by more than scheduling noise (it used to, by a whole host fetch +
    # reduction); allow generous 1-core-host jitter on the lower side
    assert dt <= blocked * 3 + 2e-3, (dt, blocked)


def test_cp_ulysses_matches_single_device(tiny_pipeline):
    """Ulysses CP (head all-to-all; preset cp_ulysses) is exact like
    cp_exact — and tighter: per-head attention runs in one piece, so the
    only deviation is GSPMD layout/accumulation noise elsewhere."""
    pipe = tiny_pipeline
    ids = jnp.asarray(tokenize_batch(["", "a waterfall"], pipe.spec.text.vocab_size,
                                     pipe.spec.text.max_length))
    key = rng_ops.base_key(9)
    single = build_runner(pipe, get_strategy("single"),
                          make_mesh((1, 1, 1), devices=[jax.devices()[0]]),
                          num_frames=8, height=32, width=32, num_steps=2)
    # seq=4 divides the 64ch level's 4 heads (ulysses) but not the 32ch
    # level's 2 (ring fallback) — one program exercising BOTH paths
    cp = build_runner(pipe, get_strategy("cp_ulysses", shard_params=False),
                      make_mesh((1, 2, 4)),
                      num_frames=8, height=32, width=32, num_steps=2)
    a = np.asarray(single(pipe.params, ids, key), np.float32)
    b = np.asarray(cp(pipe.params, ids, key), np.float32)
    np.testing.assert_allclose(a, b, atol=3e-2)
