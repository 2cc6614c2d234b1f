"""Multi-host (multi-process) data-parallel training test.

Spawns 2 OS processes, each with 2 virtual CPU devices, wired together by
jax.distributed (gloo collectives) — the CPU-cluster equivalent of the
multi-host DCN path (SURVEY.md §3.5 comm-backend row, §6.8).  Exercises:
loader id-sharding by process, device_batch's
make_array_from_process_local_data path, the sharded Trainer (including a
multi-process orbax save), and asserts both processes finish in lockstep
with bit-identical final parameters.

The reference has no distributed path at all; this validates the
TPU-native one without TPU pod hardware.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # workers pin CPU + virtual devices themselves; make sure nothing from
    # the pytest process's single-process setup leaks in
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    results = []
    for out in outs:
        last = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        results.append(json.loads(last))

    assert {r["pid"] for r in results} == {0, 1}
    assert all(r["step"] == 2 for r in results)
    # replicated params must be bit-identical across processes
    assert results[0]["fingerprint"] == results[1]["fingerprint"]
    assert results[0]["fingerprint"] > 0
    # the multi-host eval path (sharded loaders + host-side detection
    # allgather) must yield the identical metric on every process...
    assert results[0]["eval_mAP"] == results[1]["eval_mAP"]
    # ...while covering the full set with each process decoding only its
    # own shard (work scales 1/n_hosts; shards partition the 8 images)
    assert all(r["eval_images"] == 8 for r in results)
    # (sum can exceed 8: partial global buckets pad by repeating head
    # examples, which may duplicate an image into the other shard)
    assert all(0 < r["eval_local_images"] < 8 for r in results)
    assert (results[0]["eval_local_images"]
            + results[1]["eval_local_images"]) >= 8
    # the orbax checkpoint was written by the distributed save path
    assert (tmp_path / "ckpt").exists()
