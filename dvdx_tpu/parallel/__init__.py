"""Mesh-sharded execution: the reference's four strategy scripts become
sharding configurations of one denoiser (SURVEY.md §7 design stance)."""
