"""Driver entry-point tests: single-chip compile check + multi-chip dryrun
(__graft_entry__), plus Timer formatting parity."""

import os
import sys

import jax
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out, res = fn(*args)
    assert float(res) > 0


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)


def test_timer_suffix_format():
    from gpusolve_tpu.utils.timer import Timer

    t = Timer()
    t.add("sumBuffer", 0.012)
    t.add("sumBuffer", 0.013)
    t.add("compile", 1.5)
    s = t.suffix()
    # Reference format: ", name: Xms (Nx)" (src/Timer.cpp:17-24)
    assert ", sumBuffer: 25ms (2x)" in s
    assert ", compile: 1500ms (1x)" in s
    # Counters reset after printing.
    assert t.suffix() == ""


def test_reference_example_config_parses():
    ref = "/root/reference/examples/data-2nd_order.conf"
    if not os.path.exists(ref):
        pytest.skip("reference checkout not available")
    from gpusolve_tpu.config import Mode, parse_config

    p = parse_config(ref)
    assert p.mode == Mode.NEWTON
    assert p.grid_dim == (127, 127, 127)
    assert p.stencil.values[0] == 6.0
