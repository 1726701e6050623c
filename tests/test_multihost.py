"""Two-process multi-host launch over a CPU fleet (jax.distributed).

The reference is single-device with no communication layer (SURVEY.md
§2b); here two OS processes each contribute 4 virtual CPU devices to one
8-device global mesh, the farmer scenario NLP is padded+sharded over it,
the scenario KKT blocks factor process-locally, and the Schur corner
reduces across the process boundary (DCN-role)."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")

# the independently generated farmer-64 objective (ldl_cpp path)
_FARMER64_OBJ = -99818.2188050585


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh_solve():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
            assert p.returncode == 0, out[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    line = next(ln for ln in outs[0].splitlines()
                if ln.startswith("MULTIHOST_RESULT"))
    _, status, obj = line.split()
    assert status == "first_order"
    assert float(obj) == pytest.approx(_FARMER64_OBJ, abs=1e-5)
