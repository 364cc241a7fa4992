"""Multi-host (multi-process) sharded mapping: the DCN-axis stand-in
SURVEY §4 calls for.  Two CPU processes × 2 virtual devices each, joined
by jax.distributed, must reproduce the single-process 4-device result of
the SAME program — the mesh shape is identical, so the partitioned
program (all_gather'd k-NN candidates + psum'd Gauss-Newton) is
identical; only the transport differs (in-process vs cross-process)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = os.environ.copy()
    # the workers pick their own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run_workers(nproc: int, local_devs: int, timeout: float = 420.0):
    port = _free_port()
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port),
             str(local_devs)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-3000:]}"
    for rc, out, err in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
    raise AssertionError("no RESULT line from process 0")


@pytest.mark.slow
def test_two_process_matches_single_process():
    ref = _run_workers(nproc=1, local_devs=4)
    multi = _run_workers(nproc=2, local_devs=2)

    assert ref["n_global_devices"] == 4
    assert multi["n_global_devices"] == 4
    # identical mesh shape => identical partitioned program => identical
    # numbers up to reduction-order noise
    np.testing.assert_allclose(multi["t_w"], ref["t_w"], atol=1e-5)
    np.testing.assert_allclose(multi["q_w"], ref["q_w"], atol=1e-6)
    assert multi["corner_factors"] == ref["corner_factors"]
    assert multi["surf_factors"] == ref["surf_factors"]
    assert multi["map_surf_points"] == ref["map_surf_points"]
    # and the solve actually engaged: the deliberately wrong odometry
    # guess (0.3 m) on a same-position scan must be pulled back to origin
    assert ref["surf_factors"] > 100
    assert np.linalg.norm(ref["t_w"]) < 0.1
