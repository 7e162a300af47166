"""Quality scoring: CLIP prompt fidelity, MD-VQS, authenticity checks,
boundary temporal metrics."""
