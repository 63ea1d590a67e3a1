"""Per-op backend dispatch: XLA (`jnp`) vs Pallas TPU kernels.

``GridParams.backend`` selects:
  * ``"xla"``    — always the `jnp` implementations (ops.xla)
  * ``"pallas"`` — Pallas TPU kernels for the fused smoother / residual hot
                   path (falls back to XLA per-op where no kernel exists or
                   shapes are too small to benefit)
  * ``"auto"``   — pallas on TPU for large levels, xla otherwise

Dispatch happens at trace time (params is static), so the chosen backend is
baked into the compiled executable — no runtime branching.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from gpusolve_tpu.config import GridParams
from gpusolve_tpu.ops import xla

Array = jax.Array

# Interior element count below which Pallas slab pipelining is pointless and
# the whole level trivially fits in VMEM fused by XLA.
_PALLAS_MIN_ELEMS = 64 ** 3


def _use_pallas(params: GridParams, shape) -> bool:
    if params.backend == "xla":
        return False
    from gpusolve_tpu.ops import pallas_kernels

    if not pallas_kernels.AVAILABLE:
        return False
    n = 1
    for d in shape:
        n *= d - 2
    if params.backend == "pallas":
        return n >= _PALLAS_MIN_ELEMS
    # auto: only on TPU backends
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return n >= _PALLAS_MIN_ELEMS


def jacobi(v, f, params, h, n_iter, newton_v=None):
    if _use_pallas(params, v.shape):
        from gpusolve_tpu.ops import pallas_kernels

        return pallas_kernels.jacobi(
            v, f, params, h, n_iter, newton_v=newton_v
        )
    return xla.jacobi(v, f, params, h, n_iter, newton_v=newton_v)


def residual(v, f, params, h, newton_v=None):
    if _use_pallas(params, v.shape):
        from gpusolve_tpu.ops import pallas_kernels

        return pallas_kernels.residual(v, f, params, h, newton_v=newton_v)
    return xla.residual(v, f, params, h, newton_v=newton_v)


def apply_stencil_fas(v, params, h):
    return xla.apply_stencil_fas(v, params, h)


def restrict_full_weighting(fine, coarse_shape):
    return xla.restrict_full_weighting(fine, coarse_shape)


def interpolate(coarse, fine_shape):
    return xla.interpolate(coarse, fine_shape)
