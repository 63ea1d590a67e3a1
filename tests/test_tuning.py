"""Per-device-kind tuning table (round-2 VERDICT item 6): constants
resolve per device kind, overrides are respected, and the v5e row equals
the round-2-measured values (current behavior unchanged on this rig)."""

import importlib

from gpusolve_tpu.utils import tuning


def test_v5e_row_matches_round2_constants():
    t = tuning.for_kind("TPU v5 lite")
    assert t.vmem_limit == 126 * 1024 * 1024
    assert t.recompute_from_level is None
    assert t.spmd_vmem_budget == 100 * 1024 * 1024
    assert t.spmd_vmem_limit == 120 * 1024 * 1024
    assert t.peak_hbm_gbps == 819.0


def test_unknown_kind_gets_conservative_default():
    t = tuning.for_kind("TPU v99 hyper")
    assert t == tuning.DeviceTuning()


def test_kind_rows_differ_only_in_public_specs():
    assert tuning.for_kind("TPU v6 lite").peak_hbm_gbps == 1640.0
    assert tuning.for_kind("TPU v6 lite").vmem_limit == \
        tuning.for_kind("TPU v5 lite").vmem_limit


def test_module_override_respected():
    """The bit-identity tests monkeypatch pv2._RECOMPUTE_FROM_LEVEL; the
    lazy tuning application must not clobber an explicit override."""
    from gpusolve_tpu.ops import pallas_vcycle2 as pv2

    mod = importlib.reload(pv2)
    try:
        mod._RECOMPUTE_FROM_LEVEL = 1
        mod._apply_tuning()
        assert mod._RECOMPUTE_FROM_LEVEL == 1
    finally:
        importlib.reload(mod)


def test_probe_ceiling_none_on_cpu():
    assert tuning.probe_ceiling_gbps() is None
