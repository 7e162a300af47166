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
