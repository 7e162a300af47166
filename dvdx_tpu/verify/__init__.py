"""Proof-of-Inference: Merkle commitments, seed derivation, signatures,
commit-then-reveal spot checks with exact TPU re-execution."""
