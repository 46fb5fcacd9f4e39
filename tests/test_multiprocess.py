"""Real multi-controller execution on CPU (VERDICT round-2 next #4).

Spawns 2 jax.distributed processes (localhost coordinator, 2 CPU devices
each) running tests/helpers/distributed_worker.py, plus a single-process run
over the same 4 global devices, and asserts the per-step losses agree. This
executes the branches nothing else covers: jax.distributed.initialize, the
process_count>1 arm of Trainer._globalize
(jax.make_array_from_process_local_data), and PrefetchLoader's per-process
slice contract — the pod-run analogue of the reference's accelerate
multi-process launch (train_svd_traj_blender_14.py:821-827).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "helpers", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(args, timeout):
    return subprocess.Popen(
        [sys.executable, WORKER, *args],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    outs = [str(tmp_path / f"p{i}.json") for i in range(2)]
    procs = [
        _run([
            "--coordinator", coord, "--num_processes", "2", "--process_id", str(i),
            "--local_devices", "2", "--steps", "2", "--out", outs[i],
        ], timeout=2400)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    # Single-process reference over the same 4 global devices.
    ref_out = str(tmp_path / "ref.json")
    ref = _run(["--num_processes", "1", "--local_devices", "4", "--steps", "2",
                "--out", ref_out], timeout=2400)
    stdout, _ = ref.communicate(timeout=2400)
    assert ref.returncode == 0, f"reference worker failed:\n{stdout[-4000:]}"

    results = [json.load(open(o)) for o in outs]
    ref_losses = json.load(open(ref_out))["losses"]
    for r in results:
        assert r["process_count"] == 2
        assert r["global_devices"] == 4
        # Step 1 runs identical params on the identical global batch: the only
        # difference vs single-process is grad-psum reduction order (~1e-7).
        np.testing.assert_allclose(r["losses"][0], ref_losses[0], rtol=2e-5)
        # Step 2 runs params after one Adam update. Adam's first step is
        # +-lr elementwise (m_hat/sqrt(v_hat) = sign(g)), so gradient elements
        # whose magnitude is below the psum reduction-order noise FLIP SIGN
        # between layouts and move by 2*lr — measured ~3e-4 relative loss
        # drift. The comparison is correctness of the feeding/collective
        # contract, not bitwise optimizer equality across reduction orders.
        np.testing.assert_allclose(r["losses"][1:], ref_losses[1:], rtol=1e-2)
    # Both controllers of the SAME run must agree on every loss.
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"], rtol=1e-6)
    assert len(ref_losses) == 2
