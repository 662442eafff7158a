"""Two-process multi-host test: real jax.distributed coordination service
over TCP, 4 CPU devices per process, global 8-device ``data`` mesh.

Each process encodes its own corpus slice, the global row-sharded array
is assembled without cross-host copies, and the sharded query must match
a single-host NumPy oracle computed over the union.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

coord, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
from outline_rag_tpu.parallel.multihost import (
    build_and_query_demo, init_multihost, host_slice,
)
init_multihost(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

rng = np.random.default_rng(99)
queries = rng.standard_normal((8, 64)).astype(np.float32)
queries /= np.linalg.norm(queries, axis=1, keepdims=True)

vals, idx = build_and_query_demo(
    chunks_per_host=4096, dim=64, queries=queries, k=5
)
lo, hi = host_slice(8192)
json.dump(
    {
        "pid": pid,
        "slice": [lo, hi],
        "vals": vals.tolist(),
        "idx": idx.tolist(),
    },
    open(out_path, "w"),
)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_build_and_query(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    outs = [tmp_path / "out0.json", tmp_path / "out1.json"]
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(i), str(outs[i])],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

    r0 = json.loads(outs[0].read_text())
    r1 = json.loads(outs[1].read_text())
    # SPMD: both controllers computed identical global results
    assert r0["vals"] == r1["vals"]
    assert r0["idx"] == r1["idx"]
    assert r0["slice"] == [0, 4096] and r1["slice"] == [4096, 8192]

    # oracle: rebuild the union corpus exactly as the hosts did
    rng = np.random.default_rng(99)
    queries = rng.standard_normal((8, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    blocks = []
    for h in range(2):
        rng_h = np.random.default_rng(0 + h)
        b = rng_h.standard_normal((4096, 64)).astype(np.float32)
        blocks.append(b / np.linalg.norm(b, axis=1, keepdims=True))
    corpus = np.concatenate(blocks, axis=0)
    scores = queries @ corpus.T
    want_idx = np.argsort(-scores, axis=1, kind="stable")[:, :5]
    got_idx = np.asarray(r0["idx"])
    got_vals = np.asarray(r0["vals"])
    want_vals = np.take_along_axis(scores, want_idx, axis=1)
    np.testing.assert_allclose(got_vals, want_vals, atol=2e-5, rtol=2e-5)
    # indices may differ only on exact ties (none expected with random data)
    assert (got_idx == want_idx).mean() > 0.99
