"""Per-device-kind kernel tuning (round-2 VERDICT item 6).

Round 2 tuned the Pallas kernels against one tunneled v5e: VMEM budgets,
the wavefront recompute schedule, and the cpu-native strip size were all
chosen from measurements on that rig.  This module makes those constants
*port-portable*: they resolve per ``jax.devices()[0].device_kind`` from
the table below (seeded with the v5e-measured values, which are also the
conservative defaults for unknown parts), and a one-shot runtime probe
records the session's measured streaming ceiling to a small on-disk
cache so schedule decisions and perf claims can consult hardware
evidence instead of hardcoded lore.

Round-3 measurement note (PERF.md §6): the v5e's real streaming ceiling
is ~658 GB/s device-side (80% of spec) — the round-2 "250 GB/s" figure
was wall-clock dispatch overhead.  The wavefront kernel is VPU-bound, so
``recompute_from_level`` (trading bytes for vector work) stays None on
every current part; a future part with much higher HBM-per-VPU ratio is
where the table earns its keep.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

_MB = 1024 * 1024


@dataclasses.dataclass(frozen=True)
class DeviceTuning:
    """Per-device-kind kernel constants (see the consuming modules for
    each knob's semantics)."""

    # ops/pallas_vcycle2: Mosaic VMEM ceiling for the mega-kernel and
    # the traffic-minimal recompute schedule switch (None = write-back).
    vmem_limit: int = 126 * _MB
    recompute_from_level: Optional[int] = None
    # ops/pallas_spmd: shard-local kernel budgets.
    spmd_vmem_budget: int = 100 * _MB
    spmd_vmem_limit: int = 120 * _MB
    # ops/pallas_kernels (per-op slab kernels): slab-sizing budget and the
    # Mosaic scoped-VMEM ceiling (compiler temporaries included).
    kernels_vmem_budget: int = 11 * _MB
    kernels_vmem_limit: int = 64 * _MB
    # ops/pallas_vcycle (v1 mega-kernel): slab budget + Mosaic ceiling.
    v1_vmem_budget: int = 80 * _MB
    v1_vmem_limit: int = 110 * _MB
    # csrc temporal-blocked smoother strip budget (KB).
    cpu_strip_kb: int = 32
    # Public peak HBM bandwidth (GB/s) — reporting / roofline.
    peak_hbm_gbps: float = 819.0


# Keyed by device_kind substring (first match wins).  All current TPU
# generations share the 128 MB VMEM architecture the budgets assume; the
# entries differ only where public specs do.  Values measured/validated
# on v5e; other rows inherit them as conservative seeds.
_TABLE = (
    ("v5 lite", DeviceTuning(peak_hbm_gbps=819.0)),
    ("v5e", DeviceTuning(peak_hbm_gbps=819.0)),
    ("v6 lite", DeviceTuning(peak_hbm_gbps=1640.0)),
    ("v6e", DeviceTuning(peak_hbm_gbps=1640.0)),
    ("v5p", DeviceTuning(peak_hbm_gbps=2765.0)),
    ("v4", DeviceTuning(peak_hbm_gbps=1228.0)),
    ("v3", DeviceTuning(peak_hbm_gbps=900.0)),
)
_DEFAULT = DeviceTuning()

_cached: Optional[DeviceTuning] = None
_cached_kind: Optional[str] = None


def device_kind() -> str:
    """The first device's kind, '' when no backend is initialisable."""
    try:
        import jax

        return getattr(jax.devices()[0], "device_kind", "") or ""
    except Exception:
        return ""


def for_kind(kind: str) -> DeviceTuning:
    k = (kind or "").lower()
    for sub, t in _TABLE:
        if sub in k:
            return t
    return _DEFAULT


def known_kind(kind: str) -> bool:
    """True when ``kind`` has a curated table row (vs the default seed)."""
    k = (kind or "").lower()
    return any(sub in k for sub in (s for s, _ in _TABLE))


def current() -> DeviceTuning:
    """The running device's tuning (cached after first resolution)."""
    global _cached, _cached_kind
    if _cached is None:
        _cached_kind = device_kind()
        _cached = for_kind(_cached_kind)
    return _cached


def resolved_recompute_from_level() -> Optional[int]:
    """The wavefront kernel's traffic-minimal-schedule switch, with
    measured evidence for parts the table doesn't know.

    Curated rows answer directly (every current TPU keeps the default
    None: the kernel is VPU-bound at a ~658 GB/s ceiling, PERF.md §3/§6,
    so recompute's bytes-for-vector-work trade always loses).  For an
    UNKNOWN device kind the decision consults ``probe_ceiling_gbps`` —
    the one-shot measured streaming ceiling: below ~250 GB/s streaming is
    the scarce resource and the recompute schedule (bit-identical, pinned
    by tests) pays from the first mid level.  No probe result (CPU rigs,
    probe failure) keeps the conservative write-back default."""
    kind = device_kind()
    if known_kind(kind):
        return for_kind(kind).recompute_from_level
    ceiling = probe_ceiling_gbps()
    if ceiling is not None and ceiling < 250.0:
        return 1
    return _DEFAULT.recompute_from_level


def _cache_path() -> str:
    base = os.environ.get(
        "XDG_CACHE_HOME", os.path.expanduser("~/.cache")
    )
    return os.path.join(base, "gpusolve_tpu", "probe.json")


def probe_ceiling_gbps(refresh: bool = False) -> Optional[float]:
    """This device kind's measured streaming ceiling (GB/s), from the
    one-shot runtime probe — cached on disk per device kind so repeated
    sessions skip the ~seconds-long measurement.  Returns None when no
    accelerator is available (CPU test environments)."""
    kind = device_kind()
    if not kind or "cpu" in kind.lower():
        return None
    path = _cache_path()
    cache = {}
    if os.path.exists(path):
        try:
            with open(path) as fh:
                cache = json.load(fh)
        except Exception:
            cache = {}
    if not refresh and kind in cache:
        return float(cache[kind])
    try:
        import bench  # repo-root probe (device-time, fusion-barriered)

        val = float(bench.session_ceiling_gbps())
    except Exception:
        try:
            import sys

            sys.path.insert(
                0,
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)
                ))),
            )
            import bench

            val = float(bench.session_ceiling_gbps())
        except Exception:
            return None
    cache[kind] = val
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(cache, fh)
    except OSError:
        pass
    return val
