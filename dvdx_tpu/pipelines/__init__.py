"""End-to-end generation pipelines."""
