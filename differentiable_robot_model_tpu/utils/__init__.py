"""Utilities: data generation, checkpointing, benchmarking helpers."""
