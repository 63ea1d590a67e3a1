"""Pallas TPU kernels for the bandwidth-critical smoother/residual path.

Placeholder for round-1 step 2: fused damped-Jacobi and residual+norm as
slab-pipelined Pallas kernels (manual HBM→VMEM DMA over x-slabs with 1-plane
halos, double-buffered).  Until they land, ``AVAILABLE = False`` routes
dispatch to the XLA implementations.
"""

AVAILABLE = False


def jacobi(*args, **kwargs):  # pragma: no cover
    raise NotImplementedError


def residual(*args, **kwargs):  # pragma: no cover
    raise NotImplementedError
