"""Proof-of-Inference primitives: seed derivation, signatures, proof assembly.

Functional parity with `/root/reference/InferNet/template/validator/proof.py`:
* ``derive_seed`` — HMAC-SHA256(validator_key, challenge) -> 64-bit seed
  (reference `proof.py:11-18`);
* signed message layout challenge ‖ seed_le64 ‖ sha256(video) ‖ merkle_root
  (reference `neurons/miner.py:266-332`, verified at `proof.py:21-127`);
* commit-then-reveal spot-check index sampling with *consecutive pairs* so the
  temporal-coherence check can re-derive z_{t+1} from (z_t, eps_t)
  (reference `validator.py:641-684`, `proof.py:397-416`).

Signature scheme: Ed25519 (the reference uses substrate sr25519 via the
bittensor wallet; this framework is chain-agnostic, and Ed25519 is the
TPU-host-native choice with a vetted implementation in `cryptography`).
"""

from __future__ import annotations

import dataclasses
import hashlib
import hmac
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

from cryptography.hazmat.primitives.asymmetric.ed25519 import (
    Ed25519PrivateKey,
    Ed25519PublicKey,
)
from cryptography.exceptions import InvalidSignature


def derive_seed(validator_key: bytes, challenge: bytes) -> int:
    """64-bit inference seed = first 8 bytes of HMAC-SHA256(key, challenge),
    little-endian (reference proof.py:11-18 takes digest[0:8])."""
    digest = hmac.new(validator_key, challenge, hashlib.sha256).digest()
    return int.from_bytes(digest[:8], "little")


@dataclasses.dataclass(frozen=True)
class Keypair:
    """Ed25519 signing identity for miners/validators."""

    private: Ed25519PrivateKey

    @classmethod
    def generate(cls) -> "Keypair":
        return cls(Ed25519PrivateKey.generate())

    @classmethod
    def from_seed(cls, seed: bytes) -> "Keypair":
        """Deterministic keypair from 32 bytes (tests / reproducible miners)."""
        return cls(Ed25519PrivateKey.from_private_bytes(hashlib.sha256(seed).digest()))

    @property
    def public_bytes(self) -> bytes:
        from cryptography.hazmat.primitives.serialization import (
            Encoding,
            PublicFormat,
        )

        return self.private.public_key().public_bytes(Encoding.Raw, PublicFormat.Raw)

    def sign(self, message: bytes) -> bytes:
        return self.private.sign(message)


def verify_signature(public_bytes: bytes, message: bytes, signature: bytes) -> bool:
    try:
        Ed25519PublicKey.from_public_bytes(public_bytes).verify(signature, message)
        return True
    except (InvalidSignature, ValueError):
        return False


def proof_message(challenge: bytes, seed: int, video_sha256: bytes, merkle_root: bytes) -> bytes:
    """challenge ‖ seed_le64 ‖ sha256(video) ‖ root — the byte string the miner
    signs (reference miner.py:266-332)."""
    return challenge + int(seed).to_bytes(8, "little") + video_sha256 + merkle_root


def sign_proof(keypair: Keypair, challenge: bytes, seed: int, video_bytes: bytes,
               merkle_root: bytes) -> bytes:
    return keypair.sign(proof_message(challenge, seed, hashlib.sha256(video_bytes).digest(),
                                      merkle_root))


def verify_proof_signature(public_bytes: bytes, challenge: bytes, seed: int,
                           video_bytes: bytes, merkle_root: bytes, signature: bytes) -> bool:
    msg = proof_message(challenge, seed, hashlib.sha256(video_bytes).digest(), merkle_root)
    return verify_signature(public_bytes, msg, signature)


# how far a registration's signed timestamp may deviate from the verifier's
# clock before it is rejected — bounds the replay window of a captured
# registration request to minutes instead of forever
REGISTRATION_MAX_AGE_S = 600


def registration_message(pubkey: bytes, address: str, role: str,
                         platform: str, stake: int, timestamp: int) -> bytes:
    """Canonical byte string a neuron signs to register/update its registry
    entry (length-prefixed fields — no separator injection). Binding the
    platform pin to the key owner closes the downgrade where a third party
    re-registers a victim's pubkey with a bogus platform (or a miner pins a
    foreign backend it does not run) without holding the key. `stake` is in
    the message so a replayer cannot attach an attacker-chosen stake, and
    `timestamp` (unix seconds, checked against REGISTRATION_MAX_AGE_S by the
    verifier) bounds replay of captured requests."""
    def lp(b: bytes) -> bytes:
        return len(b).to_bytes(2, "big") + b

    return (b"dvdx-register-v2" + lp(pubkey) + lp(address.encode())
            + lp(role.encode()) + lp(platform.encode())
            + int(stake).to_bytes(8, "big")
            + int(timestamp).to_bytes(8, "big"))


def sign_registration(keypair: Keypair, address: str, role: str,
                      platform: str, stake: int = 0,
                      timestamp: Optional[int] = None) -> Tuple[bytes, int]:
    """Sign a registration; returns (signature, timestamp) — the timestamp
    must be sent alongside so the verifier reconstructs the exact message."""
    ts = int(time.time()) if timestamp is None else int(timestamp)
    return keypair.sign(registration_message(
        keypair.public_bytes, address, role, platform, stake, ts)), ts


def verify_registration_signature(public_bytes: bytes, address: str, role: str,
                                  platform: str, stake: int, timestamp: int,
                                  signature: bytes, *,
                                  now: Optional[float] = None) -> bool:
    """Signature valid AND fresh (|now - timestamp| <= REGISTRATION_MAX_AGE_S).
    Stale-but-valid signatures are rejected — that is the replay bound."""
    t = time.time() if now is None else now
    if abs(t - int(timestamp)) > REGISTRATION_MAX_AGE_S:
        return False
    return verify_signature(
        public_bytes,
        registration_message(public_bytes, address, role, platform,
                             stake, timestamp), signature)


def sample_distinct_indices(domain: bytes, material: bytes, population: int,
                            k: int) -> List[int]:
    """k distinct indices in [0, population) from sha256(material || domain
    || counter) — the one rejection-sampling loop shared by the spot-check
    and video-binding samplers (a fix to either must hit both)."""
    k = min(k, population)
    picked: List[int] = []
    counter = 0
    while len(picked) < k:
        digest = hashlib.sha256(material + domain +
                                counter.to_bytes(4, "big")).digest()
        idx = int.from_bytes(digest[:8], "big") % population
        if idx not in picked:
            picked.append(idx)
        counter += 1
    return sorted(picked)


def sample_spotcheck_indices(
    merkle_root: bytes,
    challenge: bytes,
    num_steps: int,
    num_checks: int = 3,
    *,
    secret: bytes,
) -> List[int]:
    """Commit-then-reveal spot-check sampler.

    SECURITY: the indices must be *unpredictable to the miner at commit time*.
    Both `merkle_root` and `challenge` are known to the miner before it
    commits (the challenge arrives in the request), so hashing those alone
    would let a cheater grind its fake leaves until the sample misses the
    tampered steps (expected (1-m/T)^-k re-rolls of pure hashing). The
    validator therefore mixes in `secret` — fresh per-audit randomness (or a
    private key) drawn AFTER the committed root is received. Publishing
    `secret` afterwards lets third parties audit the sampling.

    Returns `num_checks` distinct step indices in [0, num_steps). Every index
    i gets its eps_i re-executed from the revealed z_i; when leaf i+1 exists
    it is also revealed so z_{i+1} re-derivation is checked — the
    consecutive-pair temporal coherence of the reference (`validator.py:641-684`,
    `proof.py:397-416`) with uniform per-step detection probability k/T
    (matching the hypergeometric p_detect of the economics model,
    `Economics/core/security_analysis.py:27-29`).
    """
    if not secret:
        raise ValueError("sample_spotcheck_indices requires the post-commit "
                         "audit secret; commit-time-known inputs alone are "
                         "grindable by the miner")
    if num_steps < 1:
        return []
    return sample_distinct_indices(b"", secret + merkle_root + challenge,
                                   num_steps, num_checks)


def sample_spotcheck_pairs(
    merkle_root: bytes,
    challenge: bytes,
    num_steps: int,
    secret: bytes,
    num_checks: int = 3,
) -> List[Tuple[int, int]]:
    """(i, min(i+1, T-1)) pair view of sample_spotcheck_indices.

    `secret` is REQUIRED (post-commit validator randomness) — root and
    challenge alone are known to the miner at commit time, so omitting it
    would make the sample grindable (see sample_spotcheck_indices)."""
    if not secret:
        raise ValueError("sample_spotcheck_pairs requires the post-commit "
                         "audit secret; commit-time-known inputs alone are "
                         "grindable by the miner")
    idxs = sample_spotcheck_indices(merkle_root, challenge, num_steps,
                                    num_checks, secret=secret)
    return [(i, i + 1) if i + 1 < num_steps else (i, i) for i in idxs]


@dataclasses.dataclass
class InferenceProof:
    """The proof dict the miner returns with a response (reference schema at
    `neurons/miner.py:643-666`)."""

    merkle_root: bytes
    signature: bytes
    miner_pubkey: bytes
    challenge: bytes
    seed: int
    num_steps: int
    timesteps: List[int]
    video_sha256: bytes

    def to_dict(self) -> dict:
        return {
            "merkle_root": self.merkle_root.hex(),
            "signature": self.signature.hex(),
            "miner_pubkey": self.miner_pubkey.hex(),
            "challenge": self.challenge.hex(),
            "seed": self.seed,
            "num_steps": self.num_steps,
            "timesteps": list(map(int, self.timesteps)),
            "video_sha256": self.video_sha256.hex(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "InferenceProof":
        return cls(
            merkle_root=bytes.fromhex(d["merkle_root"]),
            signature=bytes.fromhex(d["signature"]),
            miner_pubkey=bytes.fromhex(d["miner_pubkey"]),
            challenge=bytes.fromhex(d["challenge"]),
            seed=int(d["seed"]),
            num_steps=int(d["num_steps"]),
            timesteps=[int(t) for t in d["timesteps"]],
            video_sha256=bytes.fromhex(d["video_sha256"]),
        )
