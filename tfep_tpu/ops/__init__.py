"""TPU compute ops: geometry, z-matrix, pallas kernels."""
