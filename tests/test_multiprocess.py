"""Multi-host runtime test: two JAX processes, one global 8-device mesh.

Proves the parallel/distributed.py wiring end-to-end on CPU (SURVEY.md §4's
"multi-node without a real cluster" strategy): each process owns 4 virtual
devices, they rendezvous through the coordination service, build a global
(data=8) mesh, and run one sharded train step with per-process local batch
shards. Both processes must agree on the (replicated) loss.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multiprocess_worker.py")


@pytest.mark.slow
def test_two_process_mesh_train_step():
    port = 23000 + os.getpid() % 2000
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        _, loss, ndev = line.split()
        assert int(ndev) == 8
        losses.append(float(loss))
    # the loss is replicated over the global mesh: both hosts read the same value
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)
