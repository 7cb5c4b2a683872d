"""Compute kernels: spectral transforms, low-order stencils, tensor-product solvers."""
