"""Real multi-process jax.distributed exercise (VERDICT r4 missing #4).

Spawns 2 fresh interpreters that each call
parallel.distributed.initialize(num_processes=2), build the global
(data, space) mesh across both processes, assemble per-host batches with
host_local_batch_to_global, and run a cross-process psum-backed reduction.
This is the only way to cover the num_processes>1 path — in-process tests
can only fake it.
"""
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "_mp_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed():
    nproc, ndev = 2, 2
    addr = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), addr, str(nproc), str(pid),
             str(ndev)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
    assert any("MP_OK" in out for _, out, _ in outs), outs
    ok_line = next(out for _, out, _ in outs if "MP_OK" in out)
    assert "procs=2" in ok_line
