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


def test_kernels_budget_override_changes_slab_sizing(monkeypatch):
    """Round-5 (VERDICT r4 missing #3): a changed table value must actually
    change behavior — here the per-op kernels' x-slab size."""
    from gpusolve_tpu.ops import pallas_kernels as pk

    mod = importlib.reload(pk)
    try:
        monkeypatch.setattr(
            tuning, "current",
            lambda: tuning.DeviceTuning(
                kernels_vmem_budget=2 * 1024 * 1024
            ),
        )
        mod._apply_tuning()
        assert mod._VMEM_BUDGET == 2 * 1024 * 1024
        small_tx = mod._pick_tx(512, 520 * 512 * 4, 4, 3)
        mod2 = importlib.reload(pk)
        monkeypatch.setattr(
            tuning, "current", lambda: tuning.DeviceTuning()
        )
        mod2._apply_tuning()
        default_tx = mod2._pick_tx(512, 520 * 512 * 4, 4, 3)
        assert small_tx < default_tx
    finally:
        importlib.reload(pk)


def test_v1_limit_override_respected(monkeypatch):
    from gpusolve_tpu.ops import pallas_vcycle as pv

    mod = importlib.reload(pv)
    try:
        monkeypatch.setattr(
            tuning, "current",
            lambda: tuning.DeviceTuning(
                v1_vmem_budget=7 * 1024 * 1024,
                v1_vmem_limit=9 * 1024 * 1024,
            ),
        )
        mod._apply_tuning()
        assert mod._VMEM_BUDGET == 7 * 1024 * 1024
        assert mod._VMEM_LIMIT == 9 * 1024 * 1024
    finally:
        importlib.reload(pv)


def test_recompute_decision_consults_probe(monkeypatch):
    """Unknown device kinds resolve the recompute schedule from the
    measured streaming ceiling; curated kinds answer from the table."""
    monkeypatch.setattr(tuning, "device_kind", lambda: "TPU v99 hyper")
    monkeypatch.setattr(tuning, "probe_ceiling_gbps", lambda **kw: 150.0)
    assert tuning.resolved_recompute_from_level() == 1
    monkeypatch.setattr(tuning, "probe_ceiling_gbps", lambda **kw: 658.0)
    assert tuning.resolved_recompute_from_level() is None
    monkeypatch.setattr(tuning, "probe_ceiling_gbps", lambda **kw: None)
    assert tuning.resolved_recompute_from_level() is None
    # Curated part: the table answers, the probe is never consulted.
    monkeypatch.setattr(tuning, "device_kind", lambda: "TPU v5 lite")
    monkeypatch.setattr(
        tuning, "probe_ceiling_gbps",
        lambda **kw: (_ for _ in ()).throw(AssertionError("probed")),
    )
    assert tuning.resolved_recompute_from_level() is None


def test_cpu_strip_kb_seeds_env(monkeypatch):
    from gpusolve_tpu import cpu_native

    if not cpu_native.available():
        import pytest

        pytest.skip("csrc toolchain unavailable")
    monkeypatch.delenv("GPUSOLVE_CPU_STRIP_KB", raising=False)
    monkeypatch.setattr(cpu_native, "_lib", None)
    monkeypatch.setattr(
        tuning, "current",
        lambda: tuning.DeviceTuning(cpu_strip_kb=48),
    )
    cpu_native._load()
    import os

    assert os.environ["GPUSOLVE_CPU_STRIP_KB"] == "48"
