"""Worker process for tests/test_multihost.py.

Each process: jax.distributed.initialize over localhost, 2 local CPU
devices (4 global), RangeLoader(shard_by_process=True) slice of a
deterministic 8-sample dataset, shard_batch assembly through
`jax.make_array_from_process_local_data` (parallel/mesh.py:50-57), one
pixel-space `make_ldm_train_step` step jitted over the global mesh, plus a
single-process reference loss computed locally on the full global batch.
Writes a JSON result for the parent to cross-check.
"""

import json
import os

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=int(os.environ["NPROC"]),
    process_id=int(os.environ["PROC_ID"]))

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from rangeldm_tpu.data.datasets import RangeLoader  # noqa: E402
from rangeldm_tpu.diffusion.schedule import Schedule  # noqa: E402
from rangeldm_tpu.models.unet import UNet2D, UNetConfig  # noqa: E402
from rangeldm_tpu.parallel.mesh import shard_batch  # noqa: E402
from rangeldm_tpu.training.ldm_trainer import (  # noqa: E402
    LdmTrainConfig, make_ldm_train_step,
)
from rangeldm_tpu.training.train_state import TrainState  # noqa: E402

N, H, W, C = 8, 16, 32, 2
PER_PROC_BATCH = 4


def sample(i):
    return np.random.default_rng(100 + i).standard_normal(
        (H, W, C)).astype(np.float32)


class Ds:
    def __len__(self):
        return N

    def __getitem__(self, i):
        return {"jpg": sample(i)}


def main():
    assert jax.process_count() == int(os.environ["NPROC"])
    assert jax.device_count() == 2 * jax.process_count()
    mesh = Mesh(np.asarray(jax.devices()), ("data",))

    loader = RangeLoader(Ds(), batch_size=PER_PROC_BATCH, shuffle=True,
                         seed=0, num_threads=2, shard_by_process=True)
    my_indices = [int(i) for i in loader._order()]
    local = next(iter(loader))

    unet_cfg = UNetConfig(sample_size=(H, W), in_channels=C + 1,
                          out_channels=C, block_out_channels=(32, 32),
                          down_block_types=("DownBlock2D",) * 2,
                          up_block_types=("UpBlock2D",) * 2)
    unet = UNet2D(unet_cfg)
    params = unet.init(jax.random.PRNGKey(0),
                       np.zeros((1, H, W, C + 1), np.float32),
                       np.zeros((1,), np.int32))["params"]
    tx = optax.adam(1e-4)
    step_fn = make_ldm_train_step(
        unet_apply=lambda p, x, t: unet.apply({"params": p}, x, t),
        schedule=Schedule.create(), tx=tx, cfg=LdmTrainConfig())
    state = TrainState.create(params, tx, with_ema=False)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data", None, None, None))
    state = jax.device_put(state, repl)
    rng = jax.device_put(jax.random.PRNGKey(7), repl)

    # the real multi-process branch of parallel/mesh.py:50-57
    batch = shard_batch(mesh, local)
    assert batch["jpg"].shape[0] == PER_PROC_BATCH * jax.process_count()

    jitted = jax.jit(step_fn, in_shardings=(repl, {"jpg": data}, repl),
                     out_shardings=(repl, repl))
    new_state, metrics = jitted(state, batch, rng)
    jax.block_until_ready(metrics)
    loss = float(metrics["loss"])

    # all-gather the assembled global batch so every process can hash it
    gathered = jax.jit(lambda x: x, out_shardings=repl)(batch["jpg"])
    global_np = np.asarray(gathered)

    # single-process reference: the permutation + per-process slicing is
    # deterministic, so the expected global batch (process-major shards,
    # matching jax.devices() ordering) is computable locally; one plain
    # local-jit step on it must give the same loss
    order = np.arange(N)
    np.random.default_rng(0).shuffle(order)
    nc = N // jax.process_count()
    expect_rows = [sample(i) for p in range(jax.process_count())
                   for i in order[p::jax.process_count()][:nc][:PER_PROC_BATCH]]
    expected_global = np.stack(expect_rows)
    batch_matches = bool(np.array_equal(global_np, expected_global))

    local_state = jax.device_put(
        jax.device_get(TrainState.create(params, tx, with_ema=False)),
        jax.local_devices()[0])
    _, ref_metrics = jax.jit(step_fn)(
        local_state, jnp.asarray(expected_global), jax.random.PRNGKey(7))
    ref_loss = float(ref_metrics["loss"])

    # every process calls save_pipeline on the SAME shared path — the
    # single-writer + barrier contract of training/checkpoint.py: process 0
    # writes the artifact, the other waits on the barrier, and neither
    # returns before it exists (two unsynchronized tmp/rename swaps on
    # shared storage could interleave or crash the loser's rename)
    pipe_dir = os.environ.get("PIPE_DIR")
    if pipe_dir:
        from rangeldm_tpu.training.checkpoint import save_pipeline
        save_pipeline(pipe_dir,
                      unet_params=jax.device_get(new_state.params),
                      unet_cfg=unet_cfg)
        assert os.path.exists(os.path.join(pipe_dir, "model_index.json")), \
            f"proc {jax.process_index()} returned before the artifact exists"

    with open(os.environ["OUT"], "w") as f:
        json.dump({"process": jax.process_index(),
                   "indices": my_indices,
                   "loss": loss,
                   "ref_loss": ref_loss,
                   "batch_matches": batch_matches,
                   "global_sum": float(global_np.sum())}, f)
    print(f"proc {jax.process_index()}: loss={loss:.6f} "
          f"ref={ref_loss:.6f} batch_matches={batch_matches}")


if __name__ == "__main__":
    main()
