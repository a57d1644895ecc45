"""Vectorized kernels (numpy) + their pandas/Arrow UDF wrappers."""
