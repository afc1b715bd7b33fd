"""Compute kernels: NumPy oracle, Pallas wavefront, small-matrix DP."""
