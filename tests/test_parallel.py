"""Data-parallel correctness: N-device sharded step == single-device step.

The TPU stand-in for 'distributed test without a cluster' (SURVEY §4):
8 virtual CPU devices via --xla_force_host_platform_device_count.  Skips
when only one device is visible (e.g. the tunnelled single-chip TPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.config import build_config
from rave_tpu.parallel.mesh import (batch_sharding, make_mesh, replicated,
                                    replicate_state)
from rave_tpu.train.loop import init_state, make_train_step

pytestmark = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs >=2 devices (virtual CPU mesh)")


def tiny_cfg():
    cfg = build_config(["v2"], [
        "capacity=4", "n_signal=2048", "batch_size=4",
        "valid_signal_crop=false", "stft_scales=[512,256]",
        "phase_1_duration=1000", "update_discriminator_every=2"])
    cfg.discriminator.kind = "multi_scale"
    cfg.discriminator.capacity = 4
    cfg.discriminator.n_layers = 2
    return cfg


def test_dp_matches_single_device():
    cfg = tiny_cfg()
    batch = {"x": jax.random.normal(jax.random.PRNGKey(1),
                                    (4, 2048, 1)) * 0.1}
    rng = jax.random.PRNGKey(2)

    # single device
    state1 = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    s1, m1 = step(state1, batch, rng)

    # sharded over a 4-device mesh
    mesh = make_mesh(4)
    state2 = init_state(cfg, jax.random.PRNGKey(0))
    state2 = replicate_state(state2, mesh)
    sb = {"x": jax.device_put(batch["x"], batch_sharding(mesh))}
    with mesh:
        s2, m2 = jax.jit(make_train_step(cfg))(
            state2, sb, jax.device_put(rng, replicated(mesh)))

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=1e-4, atol=1e-5)
    # spot-check a parameter leaf
    p1 = jax.tree.leaves(s1.gen_params)[0]
    p2 = jax.tree.leaves(s2.gen_params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               rtol=1e-4, atol=1e-6)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(min(4, jax.device_count()))


def test_time_sharded_forward_matches_offline():
    """Overlap-save context parallelism: forward over a 4-way time mesh
    == offline forward in the interior (halo >= receptive field)."""
    from rave_tpu.models.rave import RAVE
    from rave_tpu.parallel.time_shard import (halo_for, make_time_mesh,
                                              time_sharded)

    cfg = build_config(["v2"], [
        "capacity=4", "n_signal=16384", "batch_size=1",
        "ratios=[2,2]", "dilations=[[1,3],[1,3]]"])
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 16384, 1)) * 0.3
    rngs = {"params": jax.random.PRNGKey(0),
            "latent": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
            "quantizer": jax.random.PRNGKey(3)}
    variables = jax.jit(model.init)(rngs, x)
    params = variables["params"]

    def fwd(a):
        return model.apply({"params": params}, a,
                           rngs={"latent": jax.random.PRNGKey(4)})

    y_off = jax.jit(fwd)(x)

    hop = cfg.total_ratio()
    halo = halo_for(4096, hop)  # generous: > full RF of the tiny stack
    mesh = make_time_mesh(4)
    y_sh = jax.jit(time_sharded(fwd, mesh, halo, hop))(x)

    assert y_sh.shape == y_off.shape
    # compare away from the global edges (per-layer edge padding differs
    # from input-level zero extension within one RF of the clip ends)
    a = np.asarray(y_off[0, halo:-halo, 0])
    b = np.asarray(y_sh[0, halo:-halo, 0])
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_time_sharded_encode_ratio():
    """Encode (2048x downsample map) through the ratio-aware wrapper."""
    from rave_tpu.models.rave import RAVE
    from rave_tpu.parallel.time_shard import (halo_for, make_time_mesh,
                                              time_sharded_ratio)

    cfg = build_config(["v2"], [
        "capacity=4", "n_signal=16384", "batch_size=1",
        "ratios=[2,2]", "dilations=[[1,3],[1,3]]"])
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 16384, 1)) * 0.3
    rngs = {"params": jax.random.PRNGKey(0),
            "latent": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
            "quantizer": jax.random.PRNGKey(3)}
    variables = jax.jit(model.init)(rngs, x)
    params = variables["params"]

    def enc(a):
        return model.apply({"params": params}, a, method=RAVE.encode,
                           rngs={"latent": jax.random.PRNGKey(4)})

    z_off = jax.jit(enc)(x)
    hop = cfg.total_ratio()
    halo = halo_for(4096, hop)
    mesh = make_time_mesh(4)
    z_sh = jax.jit(time_sharded_ratio(enc, mesh, halo, hop, hop))(x)
    assert z_sh.shape == z_off.shape
    hz = halo // hop
    np.testing.assert_allclose(np.asarray(z_off[0, hz:-hz]),
                               np.asarray(z_sh[0, hz:-hz]),
                               rtol=2e-3, atol=2e-4)


def test_multihost_put_branch():
    """The multi-host batch `put` path (trainer make_put with
    multiprocess=True): make_array_from_process_local_data assembles the
    global batch from per-process shards -- exercised here on a single
    process so the branch is covered without a cluster
    (train/trainer.py make_put)."""
    from rave_tpu.train.trainer import make_put

    mesh = make_mesh(4)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    batch = {"x": np.arange(4 * 8, dtype=np.float32).reshape(4, 8, 1),
             "speaker": np.arange(4, dtype=np.int32),
             "scalar": np.float32(3.0)}

    single = make_put(bs, rep, multiprocess=False)(batch)
    multi = make_put(bs, rep, multiprocess=True)(batch)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(single[k]),
                                      np.asarray(multi[k]))
    assert multi["x"].sharding.is_equivalent_to(bs, 3)
    # the assembled arrays are consumable by a jitted reduction
    tot = jax.jit(lambda b: jnp.sum(b["x"]) + jnp.sum(b["speaker"]))(multi)
    assert float(tot) == float(batch["x"].sum() + batch["speaker"].sum())


def test_two_process_multihost(tmp_path):
    """REAL 2-process multi-host DP over the jax.distributed coordination
    service (the ``--multihost`` path): coordinator init, per-process
    shard assembly (``make_put`` multiprocess branch), one GSPMD DP step
    over a mesh spanning processes, and the collective orbax save --
    verified to produce the same update as a single-process run on the
    same global batch."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    # pick a free coordinator port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    env = dict(**{k: v for k, v in __import__("os").environ.items()
                  if k != "PALLAS_AXON_POOL_IPS"})
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    worker = Path(__file__).parent / "multihost_worker.py"

    def launch(outdir):
        procs = [subprocess.Popen(
            [sys.executable, str(worker), coord, "2", str(i), str(outdir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=str(Path(__file__).parent.parent))
            for i in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode())
        return procs, outs

    outdir = tmp_path / "mh"
    outdir.mkdir()
    procs, outs = launch(outdir)
    for attempt in range(2):
        if not (any(p.returncode != 0 for p in procs) and any(
                "Gloo context initialization failed" in o for o in outs)):
            break
        # infra flake, not product code: gloo's KV rendezvous has a fixed
        # 30 s deadline, and on a loaded 2-core host the workers' compile
        # skew can exceed it (observed when the suite shares the box with
        # a training run).  Retry up to twice -- the compile cache is
        # warm after the first attempt.  Product failures (e.g. the
        # round-3 orbax barrier race, FAILED_PRECONDITION "Barrier ...
        # already ongoing") do NOT match this filter and fail
        # immediately.
        outdir = tmp_path / f"mh_retry{attempt}"
        outdir.mkdir()
        procs, outs = launch(outdir)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    # both processes saw the identical replicated result
    leaf0 = np.load(outdir / "leaf_0.npy")
    leaf1 = np.load(outdir / "leaf_1.npy")
    np.testing.assert_array_equal(leaf0, leaf1)
    loss0 = float(np.load(outdir / "loss_0.npy"))

    # single-process reference on the same global batch
    from rave_tpu.train.loop import init_state as _init, \
        make_train_step as _mts
    cfg = tiny_cfg()
    gx = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (4, 2048, 1))) * 0.1
    state = _init(cfg, jax.random.PRNGKey(0))
    s1, m1 = jax.jit(_mts(cfg))(state, {"x": jnp.asarray(gx)},
                                jax.random.PRNGKey(2))
    np.testing.assert_allclose(loss0, float(m1["loss_gen_total"]),
                               rtol=1e-4, atol=1e-5)
    ref = np.asarray(jax.tree.leaves(s1.gen_params)[0])
    np.testing.assert_allclose(leaf0, ref, rtol=1e-4, atol=1e-6)

    # the collective orbax save produced one valid checkpoint
    from rave_tpu.train.checkpoint import CheckpointManager
    assert CheckpointManager(str(outdir)).latest_step() is not None
