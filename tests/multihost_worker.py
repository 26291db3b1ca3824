"""Worker process for the real 2-process multi-host DP test.

Launched by ``tests/test_parallel.py::test_two_process_multihost`` as
``python tests/multihost_worker.py <coord> <n_proc> <pid> <outdir>``.
Each process owns 2 virtual CPU devices; together they form a 4-device
DP mesh over the jax.distributed coordination service -- the same code
path ``rave-tpu train --multihost`` takes on a real multi-host TPU pod
(SURVEY §2.9; the reference has no multi-node path).

Exercises, end to end:
* ``jax.distributed.initialize`` (coordinator + process ranks),
* global mesh over devices spanning processes,
* per-process shard assembly via ``make_put`` (multiprocess branch,
  ``make_array_from_process_local_data``),
* one jitted DP train step (GSPMD gradient psum over the mesh),
* the every-process-must-enter-save orbax invariant
  (``CheckpointManager.save`` is a cross-process collective).

Writes ``leaf_<pid>.npy`` (a replicated param leaf fetched after the
step) for the parent to compare against a single-process run.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
coord, n_proc, pid, outdir = sys.argv[1:5]

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: without it each worker compiles the train
# step from scratch (~30-60 s on a loaded 2-core host) and the SKEW
# between the two workers' compile times can exceed gloo's fixed 30 s
# KV-rendezvous deadline ("Gloo context initialization failed:
# DEADLINE_EXCEEDED"), an infra flake unrelated to the code under test
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("RAVE_TPU_TEST_CACHE",
                                 "/tmp/rave_tpu_test_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.distributed.initialize(coordinator_address=coord,
                           num_processes=int(n_proc),
                           process_id=int(pid))

import numpy as np  # noqa: E402

from rave_tpu.config import build_config  # noqa: E402
from rave_tpu.parallel.mesh import (batch_sharding, make_mesh,  # noqa: E402
                                    replicate_state, replicated)
from rave_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from rave_tpu.train.loop import init_state, make_train_step  # noqa: E402
from rave_tpu.train.trainer import make_put  # noqa: E402


def main():
    assert jax.process_count() == int(n_proc), jax.process_count()
    assert jax.device_count() == 2 * int(n_proc)
    cfg = build_config(["v2"], [
        "capacity=4", "n_signal=2048", "batch_size=4",
        "valid_signal_crop=false", "stft_scales=[512,256]",
        "phase_1_duration=1000", "update_discriminator_every=2"])
    cfg.discriminator.kind = "multi_scale"
    cfg.discriminator.capacity = 4
    cfg.discriminator.n_layers = 2

    mesh = make_mesh()
    bs, rep = batch_sharding(mesh), replicated(mesh)
    state = init_state(cfg, jax.random.PRNGKey(0))
    state = replicate_state(state, mesh)
    put = make_put(bs, rep)

    # the GLOBAL batch is the same one the parent's single-process run
    # uses; this process contributes rows [pid*2, pid*2+2)
    gx = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (4, 2048, 1))) * 0.1
    local = gx[int(pid) * 2:(int(pid) + 1) * 2]
    batch = put({"x": local})
    rng = jax.device_put(jax.random.PRNGKey(2), rep)

    with mesh:
        step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
        state, metrics = step(state, batch, rng)

    # collective checkpoint: EVERY process must enter save()
    ckpt = CheckpointManager(outdir)
    ckpt.save(state, {"validation": float(metrics["loss_gen_total"])})
    ckpt.wait()

    leaf = np.asarray(jax.tree.leaves(state.gen_params)[0])
    np.save(os.path.join(outdir, f"leaf_{pid}.npy"), leaf)
    np.save(os.path.join(outdir, f"loss_{pid}.npy"),
            np.float32(metrics["loss_gen_total"]))
    print(f"worker {pid}: ok", flush=True)


if __name__ == "__main__":
    main()
