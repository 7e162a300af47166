"""Native C++ hasher vs Python hashlib reference."""

import hashlib

import numpy as np
import pytest

from dvdx_tpu.utils import native
from dvdx_tpu.verify.merkle import MerkleCommitment, leaf_hash, merkle_root

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_sha256_matches_hashlib():
    for data in [b"", b"abc", b"x" * 1000, np.random.default_rng(0).bytes(100000)]:
        assert native.sha256(data) == hashlib.sha256(data).digest()


def test_native_leaves_match_python():
    rng = np.random.default_rng(1)
    n = 7
    ts = np.array([961, 881, 801, 721, 641, 561, 481], np.uint16)
    zs = rng.normal(size=(n, 4, 8, 8)).astype(np.float16)
    epss = rng.normal(size=(n, 4, 8, 8)).astype(np.float16)
    got = native.sha256_leaves(ts, zs, epss)
    expected = [leaf_hash(int(t), zs[i], epss[i]) for i, t in enumerate(ts)]
    assert got == expected


def test_native_root_matches_python():
    rng = np.random.default_rng(2)
    leaves = [rng.bytes(32) for _ in range(9)]  # odd count -> duplication path
    assert native.merkle_root(leaves) == merkle_root(leaves)


def test_commitment_uses_native_and_agrees():
    rng = np.random.default_rng(3)
    n = 5
    ts = np.arange(n, dtype=np.uint16) * 100 + 1
    zs = rng.normal(size=(n, 2, 4, 4)).astype(np.float16)
    epss = rng.normal(size=(n, 2, 4, 4)).astype(np.float16)
    a = MerkleCommitment(ts, zs, epss, use_native=True)
    b = MerkleCommitment(ts, zs, epss, use_native=False)
    assert a.root == b.root


def test_native_throughput_sane():
    """50 steps x 2 x 2.8MB (Zeroscope-XL scale) should hash well under 1s."""
    import time

    rng = np.random.default_rng(4)
    n = 50
    zs = rng.integers(0, 255, size=(n, 2_800_000), dtype=np.uint8)
    epss = rng.integers(0, 255, size=(n, 2_800_000), dtype=np.uint8)
    ts = np.arange(n, dtype=np.uint16)
    t0 = time.time()
    native.sha256_leaves(ts, zs, epss)
    dt = time.time() - t0
    assert dt < 2.0, f"native hashing too slow: {dt:.2f}s"
