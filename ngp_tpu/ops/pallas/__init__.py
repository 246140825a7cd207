"""Pallas TPU kernels (experimental fast paths)."""
