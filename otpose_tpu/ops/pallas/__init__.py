"""Pallas TPU kernels for the conv-transformer hot path."""
