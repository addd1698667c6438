"""Multi-host data-parallel integration test (VERDICT round-1 item 5).

Spawns two real OS processes, each with 2 virtual CPU devices, federated into
one 4-device mesh via jax.distributed + gloo CPU collectives. Each process
feeds only its DataLoader shard of the global batch; `shard_batch` assembles
the global array with jax.make_array_from_process_local_data. The resulting
loss trajectory must match a single-process 4-device run of the identical
program — proving per-host feeding reconstructs the same global batch and the
cross-host gradient all-reduce is numerically right (the reference's
multi-node DDP story, configs/trainer/ddp.yaml)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the worker sets its own platform/device-count flags
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def _run(nproc: int, tmpdir) -> list[dict]:
    port = _free_port()
    procs, outs = [], []
    for i in range(nproc):
        out = os.path.join(tmpdir, f"worker_{nproc}_{i}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port), out],
            env=_clean_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    results = []
    for p, out in zip(procs, outs):
        stdout, _ = p.communicate(timeout=900)
        assert p.returncode == 0, stdout.decode()[-3000:]
        with open(out) as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    dist = _run(2, str(tmp_path))
    single = _run(1, str(tmp_path))[0]

    for r in dist:
        assert r["global_devices"] == 4
        assert r["local_devices"] == 2
    # both processes observe the identical (replicated) global loss
    np.testing.assert_allclose(dist[0]["g_losses"], dist[1]["g_losses"], rtol=1e-6)
    np.testing.assert_allclose(dist[0]["d_loss"], dist[1]["d_loss"], rtol=1e-6)
    # and the 2-host run tracks the single-process oracle
    np.testing.assert_allclose(dist[0]["g_losses"], single["g_losses"], rtol=2e-4)
    np.testing.assert_allclose(dist[0]["d_loss"], single["d_loss"], rtol=2e-4)
