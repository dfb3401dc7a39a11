"""Two-process multi-host coverage (SURVEY.md §5 multi-host feed design).

Spawns two ``jax.distributed`` CPU processes (2 virtual devices each, gloo
collectives) that read host-sharded TFRecords and run one sharded train
step through ``shard_batch``'s ``make_array_from_process_local_data``
branch — the one distribution path single-process tests cannot reach
(``parallel/mesh.py:130-136``, ``pipeline.py`` host sharding).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from x3d_tpu.data.tfrecords import write_video_array_shards


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_four_process_tensor_parallel_head(tmp_path):
    """2x2 mesh over 4 one-device processes: the model axis (head TP)
    crosses process boundaries and the native loader feeds per data
    group — ``make_array_from_process_local_data`` under TP, not just
    pure DP (see multihost_tp_worker.py)."""
    from x3d_tpu.data.native_loader import available

    if not available():
        pytest.skip("native clip loader not built")

    rng = np.random.RandomState(0)
    vids = [(rng.randint(0, 255, (12, 48, 64, 3), dtype=np.uint8), i % 3)
            for i in range(8)]
    write_video_array_shards(vids, str(tmp_path), prefix="train",
                             videos_per_record=2)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    port = str(_free_port())
    worker = os.path.join(repo, "tests", "multihost_tp_worker.py")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), port, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(4)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    lines = {}
    for pid, out in enumerate(outs):
        lines[pid] = [l for l in out.splitlines()
                      if l.startswith(f"WORKER {pid} OK")][0]
    # every process observes the same globally-reduced loss
    losses = [float(l.split("loss=")[1].split()[0]) for l in lines.values()]
    assert all(x == pytest.approx(losses[0], rel=1e-6) for x in losses)
    # the two processes of one data group hold COMPLEMENTARY head shards
    # (tensor parallelism across processes), and both data groups agree
    for a, b in ((0, 1), (2, 3)):
        cols_a = lines[a].split("fc1_cols=")[1].split()[0]
        cols_b = lines[b].split("fc1_cols=")[1].split()[0]
        assert cols_a.startswith("0:") and not cols_b.startswith("0:")
        assert cols_a != cols_b


@pytest.mark.slow
def test_two_process_sharded_train_step(tmp_path):
    rng = np.random.RandomState(0)
    vids = [(rng.randint(0, 255, (12, 48, 64, 3), dtype=np.uint8), i % 3)
            for i in range(8)]
    # 4 shards -> 2 per host under .shard(host_count=2)
    write_video_array_shards(vids, str(tmp_path), prefix="train",
                             videos_per_record=2)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo, PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)   # workers pin their own device count
    port = str(_free_port())
    worker = os.path.join(repo, "tests", "multihost_worker.py")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), port, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("WORKER")][0]
        losses.append(float(line.split("loss=")[1]))
    # both processes observe the same globally-reduced loss
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
