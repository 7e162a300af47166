"""dvdx_tpu — TPU-native Decentralised Verification & Distributed eXecution of
large-scale video diffusion models.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the reference
system (noorgme/Decentralised-Verification-and-Distributed-Execution-of-Large-
Scale-Video-Diffusion-Models):

1. ``dvdx_tpu.models`` / ``dvdx_tpu.ops`` / ``dvdx_tpu.pipelines`` — Zeroscope-class
   latent video diffusion (UNet3D + CLIP text encoder + VAE) as pure-functional
   Flax modules with deterministic DDIM sampling.
2. ``dvdx_tpu.parallel`` — mesh-sharded execution strategies: parameter sharding
   (the FSDP analog via GSPMD), temporal latent chunking with overlap blending
   (the sequence/context-parallel analog), hybrid, and hybrid + context-coherence
   injection — all as sharding specs of ONE denoiser, not separate scripts.
3. ``dvdx_tpu.verify`` — Proof-of-Inference: Merkle commitments over per-step
   latents, HMAC seed derivation, ed25519 signing, commit-then-reveal spot checks
   with *exact* re-execution on bitwise-deterministic TPU kernels.
4. ``dvdx_tpu.network`` — miner/validator neuron framework, wire protocol,
   mock transport, REST prompt API, deterministic escrow/reward ledger.
5. ``dvdx_tpu.scoring`` — CLIP prompt-fidelity and MD-VQS quality scoring.
6. ``dvdx_tpu.economics`` — vectorised Monte-Carlo security/cost simulations.

Reference layer map: /root/reference (see SURVEY.md).
"""

__version__ = "0.1.0"
