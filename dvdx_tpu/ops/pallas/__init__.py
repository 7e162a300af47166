"""Hand-written Pallas TPU kernels for the hot ops (flash attention, fused
blend). Each has an XLA reference implementation and bit-level tests — the
Proof-of-Inference layer depends on run-to-run determinism."""
