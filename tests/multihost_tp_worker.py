"""Worker for the 4-process tensor-parallel multi-host test.

Four ``jax.distributed`` CPU processes with ONE device each form a
2(data) x 2(model) mesh in which BOTH axes cross process boundaries:

    grid = [[d0(p0), d1(p1)],     row = data shard, col = model shard
            [d2(p2), d3(p3)]]

so the classifier-head tensor parallelism (fc_1 columns / fc_2 rows,
``parallel/mesh.py:_param_spec``) spans processes — the regime the
single-process 8-device tests cannot reach.  The feed is the NATIVE C++
loader sharded per data group: processes in the same mesh row replicate
one batch shard, so they must read the same files deterministically
(host_id = data-group index, host_count = number of data groups,
num_threads=1 for a schedule-free order); ``shard_batch`` then assembles
the global batch via ``jax.make_array_from_process_local_data`` with
cross-process model-axis replication.

Usage: python tests/multihost_tp_worker.py <process_id> <port> <data_dir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid, port, data_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(f"localhost:{port}", num_processes=4,
                               process_id=pid)
    assert jax.process_count() == 4
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 1

    import jax.numpy as jnp
    import numpy as np

    from x3d_tpu import variant_config
    from x3d_tpu.data.native_loader import NativeClipLoader, available
    from x3d_tpu.models import create_model
    from x3d_tpu.parallel import create_mesh, shard_batch, shard_state
    from x3d_tpu.train import create_train_state, make_train_step

    assert available(), "native loader must build for this test"

    cfg = variant_config("XS")
    cfg.NETWORK.C1_CHANNELS = 4
    cfg.NETWORK.DEPTH_FACTOR = 0.34
    cfg.NETWORK.NUM_CLASSES = 4
    cfg.NETWORK.DROPOUT_RATE = 0.0
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 44]
    cfg.TEST.NUM_TEMPORAL_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1

    mesh = create_mesh(data=2, model=2)
    # grid rows follow jax.devices() order = process order: row 0 is
    # processes {0,1}, row 1 is {2,3}; columns (model axis) pair p0 with
    # p1 and p2 with p3 — tensor parallelism ACROSS processes.
    data_group, model_idx = pid // 2, pid % 2
    row = mesh.devices[data_group]
    assert row[model_idx].process_index == pid

    # Per-DATA-GROUP native-loader sharding: the two processes of a mesh
    # row hold the same batch shard (model axis replicates activations),
    # so both read the group's files in one deterministic order.
    reader = NativeClipLoader(cfg, is_training=True, seed=data_group,
                              num_threads=1, host_id=data_group,
                              host_count=2)
    local = next(iter(reader(os.path.join(data_dir, "train-*"),
                             batch_size=2)))
    batch = shard_batch(local, mesh)
    assert batch["video"].shape[0] == 4, batch["video"].shape

    model = create_model(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(cfg, model, rng,
                               jnp.zeros((1, 4, 32, 32, 3)),
                               steps_per_epoch=2)
    state = shard_state(state, mesh)
    step = jax.jit(make_train_step(model, cfg.NETWORK.WEIGHT_DECAY))
    batch["video"] = batch["video"].astype(jnp.float32) / 255.0
    new_state, metrics = step(state, batch, rng)
    loss = float(metrics["loss"])
    assert int(new_state.step) == 1

    # head-TP layout: this process's single device must hold exactly its
    # model-column slice of fc_1 (columns) and fc_2 (rows)
    fc1 = new_state.params["fc_1"]["kernel"]
    fc2 = new_state.params["fc_2"]["kernel"]
    (s1,), (s2,) = fc1.addressable_shards, fc2.addressable_shards
    half1, half2 = fc1.shape[1] // 2, fc2.shape[0] // 2
    assert s1.data.shape == (fc1.shape[0], half1), s1.data.shape
    assert s2.data.shape == (half2, fc2.shape[1]), s2.data.shape
    c0 = s1.index[1].start or 0
    r0 = s2.index[0].start or 0
    assert c0 == model_idx * half1, (c0, model_idx)
    assert r0 == model_idx * half2, (r0, model_idx)

    print(f"WORKER {pid} OK loss={loss:.6f} fc1_cols={c0}:{c0 + half1} "
          f"fc2_rows={r0}:{r0 + half2}", flush=True)


if __name__ == "__main__":
    main()
