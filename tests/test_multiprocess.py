"""Multi-process mesh correctness (VERDICT r4 #4).

A 2-process x 4-device CPU mesh (jax.distributed, the DCN multi-slice
analog) must train the SAME model and produce the SAME detections as one
process with 8 devices: the train step computes statistics replicated
after one all-gather (bitwise mesh-invariant), mining is deterministic per
process, and host-staged pool inserts replicate.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mp.npz")
    procs = []
    for pid in range(2):
        env = os.environ.copy()
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_worker.py"),
             "--process-id", str(pid), "--num-processes", "2",
             "--coordinator", f"127.0.0.1:{port}",
             "--local-devices", "4", "--out", out],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker rc={p.returncode}:\n{log[-4000:]}"
    assert os.path.exists(out), logs[0][-4000:]
    mp = np.load(out)

    # single-process reference: the SAME program on this session's
    # 8-device mesh (conftest provides the virtual devices)
    from mp_worker import run_program
    from waldboost_tpu.parallel.mesh import make_mesh
    ref_path = str(tmp_path / "sp.npz")
    run_program(make_mesh(8), ref_path)
    sp = np.load(ref_path)

    assert set(mp.files) == set(sp.files)
    # the MODEL is bitwise identical across process layouts: trees, thetas,
    # and the detection outputs.  The scalar loss statistic may differ by
    # ~1 ULP — the 2-process GSPMD partition orders the (replicated)
    # exp-loss reduction differently than the single-process compile —
    # which is logging-only precision, not model state.
    np.testing.assert_array_equal(mp["theta"], sp["theta"])
    np.testing.assert_allclose(mp["losses"], sp["losses"], rtol=1e-6)
    for f in mp.files:
        if f == "losses":
            continue
        np.testing.assert_array_equal(mp[f], sp[f], err_msg=f)
