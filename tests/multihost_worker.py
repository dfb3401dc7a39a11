"""Worker process for the two-process multi-host test (test_multihost.py).

Each process owns 2 virtual CPU devices; together they form a 4-device
data mesh spanning processes.  The worker drives the REAL multi-host path:
``InputReader(host_id, host_count)`` shards the input files per host, and
``shard_batch`` assembles the global batch via
``jax.make_array_from_process_local_data`` (``parallel/mesh.py``).

Usage: python tests/multihost_worker.py <process_id> <port> <data_dir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid, port, data_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4

    import jax.numpy as jnp

    from x3d_tpu import variant_config
    from x3d_tpu.data.pipeline import InputReader
    from x3d_tpu.models import create_model
    from x3d_tpu.parallel import create_mesh, shard_batch, shard_state
    from x3d_tpu.train import create_train_state, make_train_step

    cfg = variant_config("XS")
    cfg.NETWORK.C1_CHANNELS = 4
    cfg.NETWORK.DEPTH_FACTOR = 0.34
    cfg.NETWORK.NUM_CLASSES = 3
    cfg.NETWORK.DROPOUT_RATE = 0.0
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 44]
    cfg.TEST.NUM_TEMPORAL_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1

    mesh = create_mesh(data=4, model=1)
    # host-sharded file reading: each process consumes its half of the files
    reader = InputReader(cfg, is_training=True, use_tfrecord=True, seed=0,
                         host_id=jax.process_index(),
                         host_count=jax.process_count())
    local_batch = 2   # global batch 4 over the 4-device data axis
    it = reader.as_numpy(os.path.join(data_dir, "train-*"), local_batch)
    local = next(it)

    batch = shard_batch(local, mesh)           # multi-process branch
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
    print(f"WORKER {pid} OK loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
