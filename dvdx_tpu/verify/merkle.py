"""Merkle commitments over per-step denoising records.

Wire-compatible with the reference's tree (leaf = sha256(t_be16 || z_bytes ||
eps_bytes); parents hash the *sorted* pair; odd nodes are duplicated) so proofs
interoperate — reference construction at
`/root/reference/InferNet/neurons/miner.py:180-264` (sorted-pair hashing
`:226-232`, proof paths `:236-249`) and verification at
`/root/reference/InferNet/template/validator/proof.py:250-304`.

Design differences from the reference (not a port):
* leaves are raw little-endian bfloat16/float16 array bytes, not torch
  serialisations — any host can recompute them from the numpy views;
* tree build is vectorised bottom-up over a contiguous byte buffer, and can be
  delegated to the C++ native hasher (native/merkle.cpp) for multi-MB leaves
  (the reference hashes in a Python loop);
* proof paths carry explicit sibling-side bits even though sorted-pair hashing
  makes them redundant — cheap and self-describing.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Tuple

import numpy as np

HASH_BYTES = 32


def leaf_bytes(timestep: int, z: np.ndarray, eps: np.ndarray) -> bytes:
    """Canonical leaf preimage: big-endian u16 timestep || z bytes || eps bytes.

    Same leaf format as reference `miner.py:207-224` (t_be16 ‖ z ‖ ε) so a
    validator that knows (t, z, eps) can recompute the hash from any stack.
    """
    return int(timestep).to_bytes(2, "big") + z.tobytes() + eps.tobytes()


def leaf_hash(timestep: int, z: np.ndarray, eps: np.ndarray) -> bytes:
    return hashlib.sha256(leaf_bytes(timestep, z, eps)).digest()


def _parent(a: bytes, b: bytes) -> bytes:
    lo, hi = (a, b) if a <= b else (b, a)
    return hashlib.sha256(lo + hi).digest()


def build_merkle_tree(leaf_hashes: Sequence[bytes]) -> List[List[bytes]]:
    """All levels, bottom-up. levels[0] = leaves, levels[-1] = [root]."""
    if not leaf_hashes:
        raise ValueError("empty leaf set")
    levels = [list(leaf_hashes)]
    while len(levels[-1]) > 1:
        cur = levels[-1]
        if len(cur) % 2:
            cur = cur + [cur[-1]]  # odd-node duplication
        levels.append([_parent(cur[i], cur[i + 1]) for i in range(0, len(cur), 2)])
    return levels


def merkle_root(leaf_hashes: Sequence[bytes]) -> bytes:
    return build_merkle_tree(leaf_hashes)[-1][0]


def merkle_proof(levels: List[List[bytes]], index: int) -> List[Tuple[bytes, bool]]:
    """Sibling path for leaf `index`: list of (sibling_hash, sibling_is_right)."""
    path = []
    idx = index
    for level in levels[:-1]:
        nodes = level if len(level) % 2 == 0 else level + [level[-1]]
        sib = idx ^ 1
        path.append((nodes[sib], sib > idx))
        idx //= 2
    return path


def verify_merkle_proof(leaf: bytes, path: Sequence[Tuple[bytes, bool]], root: bytes) -> bool:
    h = leaf
    for sibling, _right in path:
        h = _parent(h, sibling)  # sorted-pair: side bit not needed for the hash
    return h == root


class MerkleCommitment:
    """Commitment over a full denoise trace.

    records: list of (timestep, z_t, eps_t) numpy arrays in step order —
    exactly what pipelines.text2video.denoise(record=True) emits.
    """

    def __init__(self, timesteps: np.ndarray, zs: np.ndarray, epss: np.ndarray,
                 use_native: bool = True):
        assert len(timesteps) == len(zs) == len(epss)
        self.timesteps = np.asarray(timesteps)
        self.zs = zs
        self.epss = epss
        hasher = None
        if use_native:
            try:
                from ..utils import native as native_mod

                hasher = native_mod.sha256_leaves
            except Exception:
                hasher = None
        if hasher is not None:
            self.leaves = hasher(self.timesteps, zs, epss)
        else:
            self.leaves = [
                leaf_hash(int(t), zs[i], epss[i]) for i, t in enumerate(self.timesteps)
            ]
        self.levels = build_merkle_tree(self.leaves)

    @property
    def root(self) -> bytes:
        return self.levels[-1][0]

    def proof(self, index: int) -> List[Tuple[bytes, bool]]:
        return merkle_proof(self.levels, index)

    def open(self, index: int):
        """Reveal leaf `index`: (timestep, z_bytes, eps_bytes, path)."""
        return (
            int(self.timesteps[index]),
            self.zs[index].tobytes(),
            self.epss[index].tobytes(),
            self.proof(index),
        )
