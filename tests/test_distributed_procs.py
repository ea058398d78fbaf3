"""Multi-process jax.distributed harness on CPU (SURVEY.md §5).

Spawns N OS processes, each with 2 virtual CPU devices, wires them into one
jax.distributed job (Gloo collectives), and runs the PRODUCTION overlap
engine over the cross-process global mesh.  Asserts:

  * sharded == unsharded AlignmentTable (digest) in every process;
  * digests identical ACROSS processes (replicated output determinism).

Skips (not fails) when process spawning or the distributed runtime is
unavailable in the sandbox.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("n_proc", [2])
def test_multiprocess_engine_digest_equality(n_proc):
    port = _free_port()
    env = dict(os.environ)
    # append (never replace) PYTHONPATH: /root/.axon_site must stay visible
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(n_proc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(n_proc)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed workers timed out (sandbox limitation)")

    digests = []
    for rc, out, err in outs:
        if rc != 0:
            low = (out + err).lower()
            if any(
                s in low
                for s in ("address already in use", "unavailable", "permission",
                          "unimplemented", "gloo", "failed to connect")
            ):
                pytest.skip(f"distributed runtime unavailable: {err[-300:]}")
            raise AssertionError(f"worker failed rc={rc}\n{out}\n{err}")
        for line in out.splitlines():
            if line.startswith("DIGEST "):
                _, pid, d_local, d_mesh = line.split()
                digests.append((int(pid), d_local, d_mesh))

    assert len(digests) == n_proc, f"missing digests: {outs}"
    d0_local = digests[0][1]
    for pid, d_local, d_mesh in digests:
        assert d_local == d_mesh, f"proc {pid}: sharded != unsharded"
        assert d_local == d0_local, f"proc {pid}: cross-process mismatch"
