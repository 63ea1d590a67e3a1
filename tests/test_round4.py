"""Round-4 surface tests: --fuse auto resolution (the pod engine is the
fast distributed path — 511³ 1-chip 16.3 vs the per-leg 23.3 ms/cycle —
so it must be the default wherever its gates allow), and the explicit
flags that pin the per-leg engine.
"""

import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROGRESS_RE = re.compile(r"iter: (\d+) residual: ([\d\.e-]+) Took (\d+)ms")


def write_conf(tmp_path, mode, dim=63, maxiter=2):
    conf = tmp_path / f"r4_m{mode}_d{dim}_i{maxiter}.conf"
    conf.write_text(
        f"{maxiter}\n1e-5\n{dim}\n{dim}\n{dim}\n{mode}\n2\n2\n0.8\n1.0\n"
        "6 -1 -1 -1 -1 -1 -1\n"
        "0 1 -1 0 0 0 0\n"
        "0 0 0 1 -1 0 0\n"
        "0 0 0 0 0 1 -1\n"
    )
    return str(conf)


def run_cli(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; from gpusolve_tpu.cli import main; "
        "sys.exit(main(sys.argv[1:]))"
    )
    return subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=600,
    )


def test_fuse_auto_picks_pod_when_eligible(tmp_path):
    """63³ LINEAR on a (2,1,1) mesh satisfies every pod gate, so
    `--fuse auto` (the default) must run the pod engine."""
    conf = write_conf(tmp_path, mode=0)
    r = run_cli([conf, "--mesh", "2,1,1", "--explain-backend"])
    assert r.returncode == 0, r.stderr
    assert "fuse=auto -> pod" in r.stderr, r.stderr
    assert "fuse=pod" in r.stderr, r.stderr
    assert len(PROGRESS_RE.findall(r.stdout)) == 2, r.stdout


def test_fuse_auto_falls_back_for_rdma_halo(tmp_path):
    """--halo rdma is a per-leg engine feature: auto must keep the leg
    engine and say why."""
    conf = write_conf(tmp_path, mode=0)
    r = run_cli([conf, "--mesh", "2,1,1", "--halo", "rdma",
                 "--explain-backend"])
    assert r.returncode == 0, r.stderr
    assert "fuse=auto -> leg" in r.stderr, r.stderr
    assert "per-leg engine feature" in r.stderr, r.stderr


def test_fuse_auto_picks_pod_for_wcycle(tmp_path):
    """Late round 4: the pod engine runs W/F schedules (suffix-chain
    launches, dist/pod._linearize), so --cycle W under auto engages it
    wherever the other gates allow."""
    conf = write_conf(tmp_path, mode=0, dim=15)
    r = run_cli([conf, "--mesh", "2,1,1", "--cycle", "W",
                 "--explain-backend"])
    assert r.returncode == 0, r.stderr
    assert "fuse=auto -> pod" in r.stderr, r.stderr
    assert len(PROGRESS_RE.findall(r.stdout)) == 2, r.stdout


def test_explicit_fuse_pod_with_wcycle_runs(tmp_path):
    conf = write_conf(tmp_path, mode=0, dim=15)
    r = run_cli([conf, "--mesh", "2,1,1", "--cycle", "W",
                 "--fuse", "pod"])
    assert r.returncode == 0, r.stderr
    assert len(PROGRESS_RE.findall(r.stdout)) == 2, r.stdout


def test_fuse_auto_respects_interpret_capacity(tmp_path, monkeypatch):
    """A host that cannot simulate the mesh's device count concurrently
    (in-kernel RDMA thread-starvation deadlock) must fall back to the
    per-leg engine, not hang."""
    conf = write_conf(tmp_path, mode=0)
    monkeypatch.setenv("GPUSOLVE_INTERPRET_SYNC_CAPACITY", "1")
    r = run_cli([conf, "--mesh", "2,1,1", "--explain-backend"])
    assert r.returncode == 0, r.stderr
    assert "fuse=auto -> leg" in r.stderr, r.stderr
    assert "sync capacity" in r.stderr, r.stderr
