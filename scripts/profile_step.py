"""Capture an XLA op-level profile of a training step on the TPU.

Usage:
    python scripts/profile_step.py v2_fork [--steps 12] [--batch 8]

Runs warm steps of the given preset under ``jax.profiler.trace``, then
parses the captured xplane with the installed ``xprof`` converter and
prints the top HLO ops by self-time plus a grouped summary.  This is the
TPU equivalent of the reference's wall-clock ``Profiler`` ticks
(``rave/model.py:32-47``) at per-op resolution.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("RAVE_TPU_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def log(msg):
    print(f"[profile] {msg}", file=sys.stderr, flush=True)


def build(preset, batch, n_signal, overrides=()):
    from rave_tpu.config import build_config
    from rave_tpu.train.loop import init_state, make_train_step

    cfg = build_config([preset], [f"batch_size={batch}",
                                  f"n_signal={n_signal}",
                                  "phase_1_duration=0",
                                  "compute_dtype=bfloat16",
                                  *overrides])
    state = init_state(cfg, jax.random.PRNGKey(0), batch_size=batch)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, n_signal, 1)) * 0.1
    batch_d = {"x": x}
    if cfg.hubert_units > 0:
        frames = max(1, int(round(n_signal / cfg.sampling_rate * 50)))
        batch_d["x_perturbed"] = x[:, ::-1]
        batch_d["speaker"] = jnp.zeros((batch,), jnp.int32)
        batch_d["units"] = jax.random.randint(
            jax.random.PRNGKey(3), (batch, frames), 0, cfg.hubert_units)
    return cfg, state, step, batch_d


def sync(state):
    leaf = jax.tree.leaves(state.gen_params)[0]
    return float(jnp.asarray(leaf).ravel()[0]) + int(state.step)


def capture(state, step, batch_d, n_steps, trace_dir):
    rng = jax.random.PRNGKey(2)
    log("compile + warmup...")
    for _ in range(6):
        state, m = step(state, batch_d, rng)
    sync(state)
    log(f"tracing {n_steps} steps -> {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            state, m = step(state, batch_d, rng)
        sync(state)
    return state


def parse(trace_dir, n_steps, top=40, group_file=None):
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    tools = rtd.xspace_to_tool_names(paths)
    log(f"tools: {tools}")
    tool = ("hlo_op_stats" if any("hlo_op_stats" in t for t in tools)
            else "framework_op_stats")
    data, _ = rtd.xspace_to_tool_data(paths, tool, {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset", nargs="?", default="v2_fork")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_signal", type=int, default=131072)
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--override", action="append", default=[])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    trace_dir = f"/tmp/rave_prof_{args.preset}_{int(time.time())}"
    cfg, state, step, batch_d = build(args.preset, args.batch, args.n_signal,
                                      args.override)
    capture(state, step, batch_d, args.steps, trace_dir)
    rows = parse(trace_dir, args.steps, args.top)
    out = args.out or f"/tmp/prof_{args.preset}.json"
    with open(out, "w") as f:
        json.dump(rows, f)
    log(f"raw tool data -> {out}")


if __name__ == "__main__":
    main()
