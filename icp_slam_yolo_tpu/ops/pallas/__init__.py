"""Pallas TPU kernels for the hot ops (fused NN correspondence search)."""
