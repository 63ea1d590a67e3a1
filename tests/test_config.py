"""Config-format parsing tests (reference format: src/main.cpp:32-85)."""

import math
import os

import pytest

from gpusolve_tpu.config import GridParams, Mode, Stencil, parse_config

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def test_parse_example_newton():
    p = parse_config(os.path.join(EXAMPLES, "newton_127.conf"))
    assert p.maxiter == 10
    assert p.tol == 1e-5
    assert p.grid_dim == (127, 127, 127)
    assert p.mode == Mode.NEWTON
    assert p.pre_smoothing == 3
    assert p.post_smoothing == 3
    assert p.omega == 0.8
    assert p.gamma == 1.0
    assert p.stencil.values == (6.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0)
    assert p.stencil.offsets == (
        (0, 0, 0),
        (1, 0, 0),
        (-1, 0, 0),
        (0, 1, 0),
        (0, -1, 0),
        (0, 0, 1),
        (0, 0, -1),
    )
    # h = 1/(dimY+1) (src/main.cpp:84)
    assert p.h == pytest.approx(1.0 / 128.0)


def test_level_hierarchy_127():
    # maxlevel = floor(log2(127)) + 1 = 7; dims halve per level
    # (src/cpu/CpuGridData.cpp:19-30)
    p = parse_config(os.path.join(EXAMPLES, "linear_127.conf"))
    assert p.num_levels == 7
    dims = p.level_dims()
    assert [d[0] for d in dims] == [127, 63, 31, 15, 7, 3, 1]
    # per-level h = 1/(levelDim_y + 1) (src/cpu/CpuGridData.cpp:41)
    assert p.level_h(0) == pytest.approx(1.0 / 128.0)
    assert p.level_h(6) == pytest.approx(1.0 / 2.0)


def test_level_hierarchy_anisotropic():
    p = GridParams(
        maxiter=1, tol=1e-5, grid_dim=(31, 15, 63), mode=Mode.LINEAR,
        pre_smoothing=1, post_smoothing=1, omega=0.8, gamma=1.0,
        stencil=Stencil.poisson_7pt(),
    )
    # min dim drives depth: floor(log2(15)) + 1 = 4
    assert p.num_levels == 4
    assert p.level_dims() == ((31, 15, 63), (15, 7, 31), (7, 3, 15), (3, 1, 7))


def test_invalid_mode_rejected():
    text = "10 1e-5 7 7 7 9 3 3 0.8 1.0 " + "6 " + "-1 " * 6 + \
        "0 1 -1 0 0 0 0  0 0 0 1 -1 0 0  0 0 0 0 0 1 -1"
    from gpusolve_tpu.config import parse_config_text

    with pytest.raises(ValueError, match="mode"):
        parse_config_text(text)


def test_stencil_radius_checked():
    with pytest.raises(ValueError, match="radius"):
        Stencil(values=(1.0, 2.0), offsets=((0, 0, 0), (2, 0, 0)))


def test_tokens_not_lines():
    # The reference parses with operator>>, so line structure is cosmetic.
    from gpusolve_tpu.config import parse_config_text

    flat = "10 1e-5 7 7 7 0 3 3 0.8 1.0 6 -1 -1 -1 -1 -1 -1 " \
        "0 1 -1 0 0 0 0 0 0 0 1 -1 0 0 0 0 0 0 0 1 -1"
    p = parse_config_text(flat)
    assert p.mode == Mode.LINEAR and p.grid_dim == (7, 7, 7)
