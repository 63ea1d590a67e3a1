"""The committed hardware-parity artifact must be all-green.

``scripts/tpu_parity.py`` runs every engine × mode × size on the REAL
chip and checks residual histories against the f64 oracle; the committed
``TPU_PARITY_r*.json`` is the per-round proof that the Pallas kernels
behave on hardware, not just in interpret mode (round-2 VERDICT item 4 —
motivated by f6b6ee3's interpret-passed/hardware-deadlocked bug)."""

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifacts():
    return sorted(glob.glob(os.path.join(REPO, "TPU_PARITY_r*.json")))


def test_tpu_parity_artifact_green():
    arts = _artifacts()
    if not arts:
        pytest.skip("no TPU parity artifact committed yet")
    with open(arts[-1]) as fh:
        data = json.load(fh)
    assert data["platform"] != "cpu", "artifact must come from real TPU"
    bad = [
        f"{r['size']}^3 mode={r['mode']} {r['engine']}"
        f" margin={r.get('margin', r.get('max_rel_err'))}"
        for r in data["results"] if not r.get("ok")
    ]
    assert data["all_ok"] and not bad, bad
    # The artifact must cover every engine in at least one config.
    engines = {r["engine"] for r in data["results"] if "history" in r}
    assert {"xla", "mega", "spmd-leg", "spmd-rdma", "pod"} <= engines
    # Round-5 schema: per-row measured tolerance envelope + a normalized
    # margin (VERDICT r4 weak #4: thin, misnamed max_rel_err retired).
    if any("margin" in r for r in data["results"]):
        ran = [r for r in data["results"] if "history" in r]
        assert all("rtol" in r and "atol" in r for r in ran)
        # The pod y-split config must be present (green or explicitly
        # hardware-skipped with the device-count reason), and a >=255^3
        # row must exist.
        assert any(r["engine"] == "pod-y" for r in data["results"])
        assert any(r["size"] >= 255 for r in ran)
