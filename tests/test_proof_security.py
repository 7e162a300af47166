"""Security-property tests for the Proof-of-Inference primitives."""

import hashlib

import numpy as np
import pytest

from dvdx_tpu.network import protocol as P
from dvdx_tpu.verify.proof import (
    Keypair,
    derive_seed,
    sample_spotcheck_indices,
    sign_proof,
    verify_proof_signature,
)


def test_sampler_depends_on_validator_secret():
    """Without the post-commit secret the indices would be grindable by the
    miner (root+challenge are both miner-known at commit time)."""
    root, chal = b"\x01" * 32, b"\x02" * 32
    a = sample_spotcheck_indices(root, chal, 25, 3, secret=b"s1")
    b = sample_spotcheck_indices(root, chal, 25, 3, secret=b"s2")
    # over many secrets, samples must vary (unpredictability)
    seen = {tuple(sample_spotcheck_indices(root, chal, 25, 3,
                                           secret=bytes([i]) * 16))
            for i in range(32)}
    assert len(seen) > 10
    # deterministic + auditable given the published secret
    assert a == sample_spotcheck_indices(root, chal, 25, 3, secret=b"s1")
    assert all(0 <= i < 25 for i in a) and len(set(a)) == 3


def test_sampler_uniform_coverage():
    """Every step index must be reachable (k/T detection for all steps)."""
    hits = set()
    for i in range(200):
        hits.update(sample_spotcheck_indices(b"r" * 32, b"c" * 32, 10, 2,
                                             secret=i.to_bytes(4, "big")))
    assert hits == set(range(10))


def test_seed_derivation_is_keyed():
    c = b"\x07" * 32
    assert derive_seed(b"k1", c) != derive_seed(b"k2", c)
    assert derive_seed(b"k1", c) == derive_seed(b"k1", c)
    assert 0 <= derive_seed(b"k1", c) < 2**64


def test_signature_binds_every_field():
    kp = Keypair.from_seed(b"m")
    chal, seed, video, root = b"\x01" * 32, 42, b"vid", b"\x03" * 32
    sig = sign_proof(kp, chal, seed, video, root)
    assert verify_proof_signature(kp.public_bytes, chal, seed, video, root, sig)
    # flipping any field invalidates
    assert not verify_proof_signature(kp.public_bytes, b"\x02" * 32, seed, video, root, sig)
    assert not verify_proof_signature(kp.public_bytes, chal, 43, video, root, sig)
    assert not verify_proof_signature(kp.public_bytes, chal, seed, b"vid2", root, sig)
    assert not verify_proof_signature(kp.public_bytes, chal, seed, video, b"\x04" * 32, sig)


def test_protocol_fuzz_rejects_mutations():
    """Random single-byte corruptions of a valid frame must never produce a
    silently-wrong message (either identical decode or an exception)."""
    req = P.InferenceRequest(request_id="f", prompt="fuzz", seed=7,
                             challenge=b"\x05" * 32, num_steps=4)
    wire = bytearray(P.to_wire(req))
    rng = np.random.default_rng(0)
    outcomes = {"error": 0, "decoded": 0}
    for _ in range(300):
        buf = bytearray(wire)
        pos = int(rng.integers(0, len(buf)))
        buf[pos] ^= int(rng.integers(1, 256))
        try:
            msg = P.from_wire(bytes(buf))
            # decodable mutants must still be type-valid messages
            assert hasattr(msg, "__dataclass_fields__")
            outcomes["decoded"] += 1
        except Exception:
            outcomes["error"] += 1
    assert outcomes["error"] > 0  # framing/checks actually reject corruption


def test_protocol_oversized_frame_rejected():
    big = P.frame(b"x" * 100)
    # declare a bigger length than available
    tampered = big[:5] + (10**6).to_bytes(4, "big") + big[9:]
    with pytest.raises(ValueError):
        P.unframe(tampered)


# --- Merkle-layer binding properties (sorted-pair trees have known foot-guns;
# these tests document exactly which protocol check neutralises each one) ----


def _toy_commitment(n=5, seed=0):
    from dvdx_tpu.verify.merkle import MerkleCommitment

    rng = np.random.default_rng(seed)
    ts = np.arange(900, 900 - 20 * n, -20, dtype=np.int64)  # distinct, DDIM-like
    zs = rng.standard_normal((n, 2, 4, 4, 4)).astype(np.float16)
    eps = rng.standard_normal((n, 2, 4, 4, 4)).astype(np.float16)
    return MerkleCommitment(ts, zs, eps, use_native=False), ts, zs, eps


def test_sorted_pair_path_does_not_bind_index():
    """Sorted-pair hashing discards the sibling-side bit, so a valid path for
    leaf j verifies no matter which index the validator *asked* for — the
    Merkle check alone cannot catch a miner answering query i with leaf j.
    The leaf-embedded timestep (validator.py 'leaf_timestep' check) is what
    binds content to position; this test pins the foot-gun so a refactor that
    drops that check fails loudly."""
    from dvdx_tpu.verify.merkle import leaf_hash, verify_merkle_proof

    com, ts, zs, eps = _toy_commitment()
    # leaf 3's reveal, presented as an answer for ANY queried index:
    t3, zb, eb, path = com.open(3)
    lh = leaf_hash(t3, np.frombuffer(zb, np.float16),
                   np.frombuffer(eb, np.float16))
    assert verify_merkle_proof(lh, path, com.root)  # merkle happily accepts
    # ...so position binding must come from the schedule: every index has a
    # distinct timestep and the revealed t only matches its own position
    assert len(set(map(int, ts))) == len(ts)
    assert int(t3) == int(ts[3]) and all(int(t3) != int(ts[i])
                                         for i in range(len(ts)) if i != 3)


def test_ddim_schedule_timesteps_distinct():
    """The leaf_timestep check is only sound if the schedule never repeats a
    timestep — true for every step count the protocol accepts."""
    from dvdx_tpu.ops.scheduler import make_ddim_schedule

    for t in (2, 3, 8, 25, 50):
        steps = [int(x) for x in np.asarray(make_ddim_schedule(t).timesteps)]
        assert len(set(steps)) == len(steps)


def test_duplicate_last_leaf_collision_is_neutralised_by_pinned_count():
    """Odd-node duplication makes [A,B,C] and [A,B,C,C] share a root (the
    classic CVE-2012-2459 shape). The protocol never trusts a miner-chosen
    leaf count: the validator derives N from the request's num_steps and
    rejects a response whose timesteps list differs from the canonical
    schedule, so the collision buys a cheater nothing. This test documents
    the collision (it is real) and the neutralising invariant."""
    from dvdx_tpu.verify.merkle import merkle_root

    com, ts, zs, eps = _toy_commitment(n=3)
    dup_root = merkle_root(com.leaves + [com.leaves[-1]])
    assert dup_root == com.root  # the scheme-level collision exists...
    # ...but N is pinned: leaves = num_steps + 1 (trace records + final) in
    # the round flow, and validator.py:377 rejects any timesteps deviation.
    from dvdx_tpu.network import validator as V

    src = open(V.__file__).read()
    assert "expected_ts" in src and "timesteps" in src


def test_leaf_preimage_never_collides_with_interior_node():
    """Interior preimages are exactly 64 bytes (two sha256 digests); leaf
    preimages are 2 + 2*array_bytes. For any real latent geometry (>= 31
    bytes per tensor) the lengths differ, so a 'leaf' that is secretly an
    interior node cannot decode into the request's latent shape — frombuffer
    + reshape in the validator enforces the exact byte length."""
    from dvdx_tpu.verify.merkle import leaf_bytes

    z = np.zeros((1, 4, 4, 4), np.float16)  # smallest plausible latent
    assert len(leaf_bytes(900, z, z)) != 64
    with pytest.raises(ValueError):
        np.frombuffer(b"\x00" * 64, np.float16).reshape((1, 4, 5, 4))


def test_same_program_gate_is_two_ulps_elementwise():
    """The same-platform re-exec gate (round 5, docs/PROTOCOL.md): honest
    1-bf16-ULP divergence between the recording and re-exec executables
    passes at ANY operand magnitude (it is a relative phenomenon), while a
    reduced-precision shortcut (>= 2^-4 relative, the cheapest ApproxMiner
    rung) fails. Byte-exact still reports was_bitwise=True."""
    from dvdx_tpu.verify.spotcheck import compare_arrays

    atol, rtol = 1e-4, 2.0 ** -7   # ValidatorConfig defaults
    base = np.asarray([2e-3, 1.0, -3.7, 0.0], np.float32)

    ok, err, bit = compare_arrays(base.copy(), base, bitwise=True,
                                  atol=atol, rtol=rtol)
    assert ok and bit and err == 0.0

    # one bf16 ULP at each magnitude: 2^-8 relative
    ulp = base * (1 + 2.0 ** -8)
    ok, err, bit = compare_arrays(ulp, base, bitwise=True,
                                  atol=atol, rtol=rtol)
    assert ok and not bit
    # ...including the measured z-scale case: 3.9e-3 absolute at |z|~1,
    # far above the 1e-4 absolute floor alone
    assert float(np.max(np.abs(ulp - base))) > atol

    # a 4-mantissa-bit (fp8-class) shortcut: 2^-4 relative, must fail
    approx = base * (1 + 2.0 ** -4)
    ok, _, _ = compare_arrays(approx, base, bitwise=True,
                              atol=atol, rtol=rtol)
    assert not ok

    # tolerance-mode regimes (rtol=0) stay purely absolute
    ok, _, _ = compare_arrays(ulp, base, bitwise=False, atol=5e-2)
    assert ok
    ok, _, _ = compare_arrays(base + 0.1, base, bitwise=False, atol=5e-2)
    assert not ok
