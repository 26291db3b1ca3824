"""Profile the v2 train step on TPU; group device op time by scope.

Not committed. Usage: python tmp_profile.py [native]
"""
import collections
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

if "native" in sys.argv[1:]:
    import rave_tpu.models.discriminators as D

    class _Native(D.MultiScaleSpectralDiscriminator):
        packed: bool = False

    D.MultiScaleSpectralDiscriminator = _Native
    print("MODE: native (packed disabled)", file=sys.stderr)
else:
    print("MODE: packed", file=sys.stderr)

from rave_tpu.config import build_config
from rave_tpu.train.loop import init_state, make_train_step

B, T = 8, 131072
cfg = build_config(["v2"], [f"batch_size={B}", f"n_signal={T}",
                            "valid_signal_crop=false",
                            "phase_1_duration=0",
                            "compute_dtype=bfloat16"])
state = init_state(cfg, jax.random.PRNGKey(0), batch_size=B)
step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 1)) * 0.1
batch = {"x": x}
rng = jax.random.PRNGKey(2)


def sync(state):
    leaf = jax.tree.leaves(state.gen_params)[0]
    return float(jnp.asarray(leaf).ravel()[0]) + int(state.step)


print("compiling...", file=sys.stderr)
t0 = time.perf_counter()
state, m = step(state, batch, rng)
sync(state)
print(f"compiled in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
for _ in range(6):
    state, m = step(state, batch, rng)
sync(state)

logdir = "/tmp/rave_prof"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
NP = 8
for _ in range(NP):
    state, m = step(state, batch, rng)
sync(state)
jax.profiler.stop_trace()

# parse
paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("trace files:", paths, file=sys.stderr)
pd = jax.profiler.ProfileData.from_file(paths[0])

groups = collections.defaultdict(float)
total = 0.0
examples = collections.defaultdict(set)
for plane in pd.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    for line in plane.lines:
        for ev in line.events:
            dur = ev.duration_ns / 1e9
            name = ev.name
            scope = ""
            for st in ev.stats:
                try:
                    k, v = st
                except Exception:
                    continue
                if k in ("tf_op", "op_name", "hlo_op", "source"):
                    scope = scope or str(v)
            total += dur
            key = None
            s = (scope or name)
            for tag, pat in [
                ("spectral_disc", "msspec"),
                ("mpd", "periods"), ("mpd", "mpd"),
                ("msd", "scales"), ("msd", "msd"),
                ("stft_loss", "stft"),
                ("encoder", "encoder"), ("decoder", "decoder"),
                ("pqmf", "pqmf"),
                ("adam/opt", "adam"), ("adam/opt", "opt"),
            ]:
                if pat in s:
                    key = tag
                    break
            if key is None:
                key = "other:" + name.split(".")[0].split("(")[0][:30]
            groups[key] += dur
            if len(examples[key]) < 3:
                examples[key].add(s[:120])

per_step = {k: v / NP * 1e3 for k, v in groups.items()}
print(f"\ntotal device time/step: {total/NP*1e3:.1f} ms")
for k, v in sorted(per_step.items(), key=lambda kv: -kv[1])[:25]:
    print(f"  {v:8.2f} ms  {k}")
    for e in list(examples[k])[:2]:
        print(f"              e.g. {e}")
