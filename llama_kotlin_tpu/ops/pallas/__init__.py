"""Pallas TPU kernels for the hot ops (fused dequant-matmul, flash
attention).  Every kernel has an _or_none entry point: callers fall back to
the jnp reference path when the kernel doesn't support the shape/platform."""
