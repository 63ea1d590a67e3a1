"""Checkpoint / resume of solver state.

The reference has no checkpointing (SURVEY.md §5 — its only persistence is
the text dump consumed by plotter.py); this is the planned TPU-side addition:
save/restore of the solution state so long solves can resume.  Stored as a
compressed .npz of the logical padded fields plus the config fingerprint —
portable, no extra dependencies.

The V-cycle iteration is a stationary relaxation, so resuming from the saved
fields reproduces the remaining iterations exactly (the per-cycle inputs are
just ``v``/``f`` — and ``newton_v``/``newton_f`` in Newton mode).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from gpusolve_tpu.config import GridParams, Mode
from gpusolve_tpu.grid import GridState, build_grid

_FORMAT_VERSION = 1


def _fingerprint(params: GridParams) -> str:
    return (
        f"v{_FORMAT_VERSION};dims={params.grid_dim};mode={int(params.mode)};"
        f"stencil={params.stencil.values}{params.stencil.offsets};"
        f"omega={params.omega};gamma={params.gamma}"
    )


def save_state(
    path: str,
    state: GridState,
    params: GridParams,
    iteration: int = 0,
    history: Optional[List[float]] = None,
) -> None:
    """Write the solver state (all levels' v, plus newton_v/newton_f in
    Newton mode) and progress metadata."""
    arrays = {}
    for l, lvl in enumerate(state.levels):
        arrays[f"v_{l}"] = np.asarray(lvl.v)
        if lvl.newton_v is not None:
            arrays[f"newton_v_{l}"] = np.asarray(lvl.newton_v)
    arrays["f_0"] = np.asarray(state.levels[0].f)
    if state.newton_f is not None:
        arrays["newton_f"] = np.asarray(state.newton_f)
    np.savez_compressed(
        path,
        __fingerprint__=np.array(_fingerprint(params)),
        __iteration__=np.array(iteration),
        __history__=np.array(history if history else [], dtype=np.float64),
        **arrays,
    )


def load_state(path: str, params: GridParams):
    """Rebuild a GridState from a checkpoint.  Returns
    ``(state, iteration, history)``.  Raises on config mismatch."""
    with np.load(path, allow_pickle=False) as z:
        fp = str(z["__fingerprint__"])
        if fp != _fingerprint(params):
            raise ValueError(
                "checkpoint was written for a different problem "
                f"configuration:\n  saved: {fp}\n  "
                f"current: {_fingerprint(params)}"
            )
        state = build_grid(params)
        levels = []
        for l, lvl in enumerate(state.levels):
            import jax.numpy as jnp

            v = jnp.asarray(z[f"v_{l}"])
            kw = {"v": v}
            if f"newton_v_{l}" in z:
                kw["newton_v"] = jnp.asarray(z[f"newton_v_{l}"])
            if l == 0:
                kw["f"] = jnp.asarray(z["f_0"])
            levels.append(dataclasses.replace(lvl, **kw))
        newton_f = state.newton_f
        if "newton_f" in z:
            import jax.numpy as jnp

            newton_f = jnp.asarray(z["newton_f"])
        iteration = int(z["__iteration__"])
        history = [float(h) for h in z["__history__"]]
    return (
        dataclasses.replace(
            state, levels=tuple(levels), newton_f=newton_f
        ),
        iteration,
        history,
    )
