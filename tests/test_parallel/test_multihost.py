"""Multi-host entry point: two OS processes, 4 virtual CPU devices
each, gloo collectives — sharded_solve_ba must converge to the same
cost as the single-process run (SURVEY section 7 step 7; the BASELINE
multi-host scaling target's correctness half)."""

import os
import socket
import subprocess
import sys



_WORKER = os.path.join(os.path.dirname(__file__),
                       "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_ba():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the worker sets its own
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(_WORKER)))
    )
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=repo_root, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (rc, out[-2000:], err[-4000:])
    primary_out = outs[0][1]
    assert "WORKER_0_OK" in primary_out
    assert "WORKER_1_OK" in outs[1][1]

    cost = None
    cost0 = None
    for line in primary_out.splitlines():
        if line.startswith("FINAL_COST"):
            cost = float(line.split()[1])
        if line.startswith("INITIAL_COST"):
            cost0 = float(line.split()[1])
    assert cost is not None and cost0 is not None
    # Same convergence criterion as the single-process test
    # (tests/test_parallel/test_sharded.py).
    assert cost < 1e-8 * cost0, (cost, cost0)
