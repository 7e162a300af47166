"""Shared utilities: config, logging, video IO, metrics, testing helpers."""
