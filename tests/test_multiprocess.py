"""Real two-process distributed execution (VERDICT r2 item 2).

Launches two OS processes joined by ``jax.distributed.initialize`` on
localhost (4 virtual CPU devices each -> one 8-device global mesh) and runs
2 production train steps + a device-readout eval; the results must match the
single-process 8-device run.  This executes the multi-host branches —
``shard_batch``'s ``make_array_from_process_local_data``, ``fetch_global``'s
``process_allgather``, and the Loader's ``multihost_indices`` — under a real
``jax.process_count() == 2``, the same code path a TPU pod uses.
"""

import pytest
import json
import os
import socket
import subprocess
import sys

import numpy as np

# two-OS-process distributed launches (slow tier; run with --runslow)
pytestmark = pytest.mark.slow


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    # the workers set their own device count / platform; drop the pytest
    # session's virtual-device flags
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _launch(pid, nprocs, port, out):
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nprocs), str(port), out],
        cwd=REPO, env=_worker_env(),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def test_two_process_matches_single_process(tmp_path):
    out1 = str(tmp_path / "single.json")
    p = _launch(0, 1, 0, out1)
    stdout, _ = p.communicate(timeout=600)
    assert p.returncode == 0, f"single-process worker failed:\n{stdout}"

    port = _free_port()
    out2 = str(tmp_path / "dual.json")
    procs = [_launch(i, 2, port, out2) for i in range(2)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), (
        "two-process workers failed:\n" + "\n====\n".join(logs))

    single = json.load(open(out1))
    dual = json.load(open(out2))
    assert single["step"] == dual["step"] == 2
    np.testing.assert_allclose(dual["param_norm"], single["param_norm"],
                               rtol=1e-4)
    for key, want in single["summary"].items():
        np.testing.assert_allclose(
            dual["summary"][key], want, rtol=1e-3, atol=1e-4,
            err_msg=f"metric {key}: single {want} vs "
                    f"dual {dual['summary'][key]}")
    # full-heatmap (device_readout=False) eval must run under 2 processes
    # (global heatmap fetch via process_allgather) and agree with both the
    # readout path and the single-process golden run
    for run in (single, dual):
        for key, want in run["summary"].items():
            np.testing.assert_allclose(
                run["summary_hm"][key], want, rtol=1e-3, atol=1e-4,
                err_msg=f"heatmap-path metric {key} (nprocs="
                        f"{run['nprocs']}): readout {want} vs "
                        f"heatmap {run['summary_hm'][key]}")
