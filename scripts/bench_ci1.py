"""A/B the Pallas ci=1 head-conv stencil against XLA's conv on the real
TPU: isolated fwd / fwd+dx at the MelGAN pyramid shapes, and (--step)
the whole v2_fork train step with the dispatch gate on vs off.

Usage: python scripts/bench_ci1.py [--step]
"""
import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("RAVE_TPU_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    sync = lambda o: float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    for _ in range(5):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2 * n):
        out = fn(*args)
    sync(out)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / n


def isolated():
    from rave_tpu.ops.pallas.ci1_conv import (_native_fwd, _pallas_dx,
                                              _pallas_fwd)
    k, co = 15, 16
    pad = (7, 7)
    for T in (131072, 65536, 32768):
        B = 16
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jax.random.normal(ks[0], (B, T, 1), jnp.bfloat16)
        w = (jax.random.normal(ks[1], (k, 1, co)) * 0.3).astype(jnp.bfloat16)
        g = jax.random.normal(ks[2], (B, T, co), jnp.bfloat16)

        nat_f = jax.jit(lambda x, w: _native_fwd(x, w, pad))
        pal_f = jax.jit(lambda x, w: _pallas_fwd(x, w, pad))
        nat_dx = jax.jit(lambda g, w: jax.vjp(
            lambda xx: _native_fwd(xx, w, pad), x)[1](g)[0])
        pal_dx = jax.jit(lambda g, w: _pallas_dx(g, w, pad, T))

        tn = timeit(nat_f, x, w) * 1e3
        tp = timeit(pal_f, x, w) * 1e3
        tdn = timeit(nat_dx, g, w) * 1e3
        tdp = timeit(pal_dx, g, w) * 1e3
        # numerics sanity on-device
        err = float(jnp.max(jnp.abs(
            pal_f(x, w).astype(jnp.float32) -
            nat_f(x, w).astype(jnp.float32))))
        errd = float(jnp.max(jnp.abs(
            pal_dx(g, w).astype(jnp.float32) -
            nat_dx(g, w).astype(jnp.float32))))
        print(f"T={T}: fwd XLA {tn:.3f} ms vs pallas {tp:.3f} ms "
              f"({tn / tp:.2f}x, maxerr {err:.2e}); "
              f"dx XLA {tdn:.3f} ms vs pallas {tdp:.3f} ms "
              f"({tdn / tdp:.2f}x, maxerr {errd:.2e})", flush=True)


def full_step():
    from rave_tpu.config import build_config
    from rave_tpu.train.loop import init_state, make_train_step

    def run(gate):
        os.environ["RAVE_TPU_CI1_PALLAS"] = gate
        cfg = build_config(["v2_fork"], ["batch_size=8", "n_signal=131072",
                                         "phase_1_duration=0",
                                         "warmup_quantize=0",
                                         "compute_dtype=bfloat16"])
        state = init_state(cfg, jax.random.PRNGKey(0), batch_size=8)
        step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 131072, 1)) * 0.1
        batch = {"x": x, "x_perturbed": x[:, ::-1],
                 "speaker": jnp.zeros((8,), jnp.int32),
                 "units": jax.random.randint(jax.random.PRNGKey(3),
                                             (8, 148), 0, 100)}
        rng = jax.random.PRNGKey(2)
        print(f"gate={gate}: compiling...", flush=True)

        def sync(state):
            leaf = jax.tree.leaves(state.gen_params)[0]
            return float(jnp.asarray(leaf).ravel()[0]) + int(state.step)

        state, m = step(state, batch, rng)
        jax.block_until_ready(m)
        for _ in range(5):
            state, m = step(state, batch, rng)
        sync(state)
        t0 = time.perf_counter()
        for _ in range(20):
            state, m = step(state, batch, rng)
        sync(state)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(40):
            state, m = step(state, batch, rng)
        sync(state)
        t2 = time.perf_counter() - t0
        ms = (t2 - t1) / 20 * 1e3
        print(f"gate={gate}: fork step {ms:.1f} ms", flush=True)
        return ms

    off = run("0")
    on = run("1")
    print(f"fork step: ci1 pallas OFF {off:.1f} ms vs ON {on:.1f} ms "
          f"({off - on:+.1f} ms)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", action="store_true")
    args = ap.parse_args()
    isolated()
    if args.step:
        full_step()
