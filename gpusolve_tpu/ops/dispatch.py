"""Per-op backend dispatch: XLA (`jnp`) vs Pallas TPU kernels.

``GridParams.backend`` selects:
  * ``"xla"``    — always the `jnp` implementations (ops.xla)
  * ``"pallas"`` — Pallas TPU kernels for every level large enough to
                   benefit (small coarse levels always go through XLA)
  * ``"auto"``   — pallas on TPU, xla elsewhere

Dispatch happens at trace time (params is static), so the chosen backend is
baked into the compiled executable — no runtime branching.  Logical interior
dims are passed explicitly (the array shapes are tile-aligned allocations,
see gpusolve_tpu.grid.alloc_shape).

The Pallas kernels follow a dead-buffer protocol (see ops.pallas_kernels):
each op writes its result into a donor array whose *value* is dead but whose
zero halo is intact, avoiding both reallocation and halo re-zeroing.  The
level-op wrappers here hide that protocol from the solver: ``smooth`` returns
``(v_new, spare)`` where ``spare`` is the ping-pong partner buffer that now
holds a dead value.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from gpusolve_tpu.config import GridParams, Mode
from gpusolve_tpu.ops import xla

Array = jax.Array
Dims = Tuple[int, int, int]

# Interior element count below which Pallas tiling is pointless: the level is
# a footnote in the cycle cost and XLA handles it.
_PALLAS_MIN_ELEMS = 48 ** 3


def use_pallas(params: GridParams, dims: Dims) -> bool:
    if params.backend == "xla":
        return False
    # Mosaic lowering is only exercised/validated at float32: float64 has no
    # native TPU path (XLA emulates it — SURVEY §7 "f64 vs TPU"), and the
    # kernels assume (8,128) f32 tiling.  Fall back to XLA cleanly.
    if params.dtype != "float32":
        return False
    n = dims[0] * dims[1] * dims[2]
    if n < _PALLAS_MIN_ELEMS:
        return False
    if params.backend == "pallas":
        return True
    # auto: TPU only
    return jax.default_backend() in ("tpu", "axon")


def smooth(
    v: Array,
    f: Array,
    spare: Array,
    dims: Dims,
    params: GridParams,
    h: float,
    n_iter: int,
    newton_v: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """``n_iter`` damped-Jacobi sweeps.  Returns ``(v_new, spare_new)`` where
    ``spare`` is a same-shaped dead-value buffer with a zero halo (the level's
    residual scratch) used as the ping-pong partner on the Pallas path."""
    if not use_pallas(params, dims):
        return (
            xla.jacobi(v, f, dims, params, h, n_iter, newton_v=newton_v),
            spare,
        )
    from gpusolve_tpu.ops import pallas_kernels as pk

    a, b = v, spare
    for _ in range(n_iter):
        out = pk.jacobi_sweep(b, a, f, dims, params, h, newton_v=newton_v)
        a, b = out, a
    return a, b


def residual_op(
    dead: Array,
    v: Array,
    f: Array,
    dims: Dims,
    params: GridParams,
    h: float,
    newton_v: Optional[Array] = None,
    with_norm: bool = True,
) -> Tuple[Array, Array]:
    """Residual field + Σr² (sumsq is garbage when with_norm=False)."""
    if not use_pallas(params, dims):
        return xla.residual(v, f, dims, params, h, newton_v=newton_v)
    from gpusolve_tpu.ops import pallas_kernels as pk

    return pk.residual(
        dead, v, f, dims, params, h, newton_v=newton_v, with_norm=with_norm
    )


def restrict_op(
    dead_coarse: Array,
    fine: Array,
    fine_dims: Dims,
    coarse_dims: Dims,
    params: GridParams,
) -> Array:
    """Full-weighting restriction of ``fine`` into the coarse level."""
    if not use_pallas(params, fine_dims):
        return xla.restrict_full_weighting(
            fine, fine_dims, coarse_dims, dead_coarse.shape
        )
    from gpusolve_tpu.ops import pallas_kernels as pk

    return pk.restrict_full_weighting(dead_coarse, fine, coarse_dims)


def prolong_add_op(
    dead: Array,
    coarse_v: Array,
    v_fine: Array,
    coarse_dims: Dims,
    fine_dims: Dims,
    params: GridParams,
) -> Tuple[Array, Optional[Array]]:
    """``v_fine + P(coarse_v)``; also returns the correction field e when the
    XLA path computes it (Pallas fuses it away and returns None)."""
    if not use_pallas(params, fine_dims):
        e = xla.interpolate(coarse_v, coarse_dims, fine_dims, v_fine.shape)
        return v_fine + e, e
    from gpusolve_tpu.ops import pallas_kernels as pk

    return pk.prolong_add(dead, coarse_v, v_fine, fine_dims), None


def apply_stencil_fas(
    v: Array,
    dims: Dims,
    params: GridParams,
    h: float,
    dead: Optional[Array] = None,
) -> Array:
    """FAS coarse-operator application (A(v)/h² + γ·v·e^v)."""
    if dead is None or not use_pallas(params, dims):
        return xla.apply_stencil_fas(v, dims, params, h)
    from gpusolve_tpu.ops import pallas_kernels as pk

    return pk.apply_stencil_fas(dead, v, dims, params, h)
