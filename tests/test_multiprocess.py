"""True multi-process distributed tests (2 OS processes, 1 CPU device
each) — the closest single-box analog of a multi-host TPU pod.

SURVEY.md §5: the communication backend is ``jax.distributed`` +
XLA collectives (no hand-written transport); failure detection is
fail-fast on a bounded heartbeat + restart-from-checkpoint. These tests
exercise both across a REAL process boundary, unlike the 8-virtual-device
mesh tests which share one process.
"""

import os
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _launch(mode, port, timeout):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(_WORKER)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


@pytest.mark.slow
def test_multiprocess_sharded_propagation():
    """Row-sharded propagation with a REAL cross-process all_to_all."""
    outs = _launch("sharded", port=53411, timeout=300)
    for rc, out in outs:
        assert "heartbeat_ok" in out, out
        assert rc == 0, out
        assert "sharded_err" in out, out


@pytest.mark.slow
def test_multiprocess_hier_dcn_exchange():
    """Hierarchical two-level exchange with the DCN axis crossing a
    REAL process boundary (2 slices × 1 chip each)."""
    outs = _launch("hier", port=53415, timeout=300)
    for rc, out in outs:
        assert "heartbeat_ok" in out, out
        assert rc == 0, out
        assert "hier_err" in out, out


@pytest.mark.slow
def test_multiprocess_sharded_pallas():
    """The sharded pair-chunk kernel path (custom VJP + id-keyed edge
    dropout inside shard_map) under REAL multi-controller
    jax.distributed — the class of machinery that can pass
    single-process and fail cross-process."""
    outs = _launch("sharded_pallas", port=53413, timeout=480)
    for rc, out in outs:
        assert "heartbeat_ok" in out, out
        assert rc == 0, out
        assert "sharded_err" in out, out
        assert "pallas_grad_ok" in out, out


@pytest.mark.slow
def test_multiprocess_fault_detection():
    """Kill one process mid-run; the survivor must fail fast (exit 3)."""
    outs = _launch("fault", port=53412, timeout=300)
    rc1, out1 = outs[1]
    assert rc1 == 17, out1  # the injected abrupt death
    rc0, out0 = outs[0]
    assert "fault_detected" in out0, out0
    assert rc0 == 3, out0
