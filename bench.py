"""Benchmark: v2 training steps/s/chip + streaming decode RTF.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no numbers (BASELINE.md); the driver target is
">= 3x A100 steps/s on v5e-8" for v2 training and "RTF < 0.05/chip" for
streaming decode.  ``vs_baseline`` reports value / target_rtf-style
ratios where a target exists: we report steps/s as the headline and
include the measured RTF in the extras.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("RAVE_TPU_CACHE", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def bench_train(n_steps: int = 20, batch: int = 8, n_signal: int = 131072):
    from rave_tpu.config import build_config
    from rave_tpu.train.loop import init_state, make_train_step

    cfg = build_config(["v2"], [f"batch_size={batch}",
                                f"n_signal={n_signal}",
                                "valid_signal_crop=false",
                                "phase_1_duration=0"])
    state = init_state(cfg, jax.random.PRNGKey(0), batch_size=batch)
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, n_signal, 1)) * 0.1
    batch_d = {"x": x}
    rng = jax.random.PRNGKey(2)

    # warmup / compile (one gen step + one dis step shapes)
    state, m = step(state, batch_d, rng)
    jax.block_until_ready(m)
    state, m = step(state, batch_d, rng)
    jax.block_until_ready(m)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, batch_d, rng)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    return n_steps / dt


def bench_stream_decode(n_chunks: int = 50, chunk: int = 4096):
    from rave_tpu.config import build_config
    from rave_tpu.models.rave import RAVE

    cfg = build_config(["v2"])
    model = RAVE(cfg=cfg, streaming=True, train_mode=False)
    z_ch = chunk // cfg.total_ratio()
    z = jnp.zeros((1, z_ch, cfg.decoder_latent_size()), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "noise": jax.random.PRNGKey(1),
            "latent": jax.random.PRNGKey(2),
            "quantizer": jax.random.PRNGKey(3)}
    variables = model.init(rngs, z, method=RAVE.decode)
    params = variables["params"]
    cache = variables.get("cache", {})

    @jax.jit
    def dec(cache, z):
        y, upd = model.apply({"params": params, "cache": cache}, z,
                             method=RAVE.decode, mutable=["cache"],
                             rngs={"noise": jax.random.PRNGKey(4)})
        return y, upd["cache"]

    y, cache = dec(cache, z)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        y, cache = dec(cache, z)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0
    audio_seconds = n_chunks * chunk / cfg.sampling_rate
    return dt / audio_seconds  # RTF: compute time / audio time


def main():
    steps_per_s = bench_train()
    rtf = bench_stream_decode()
    out = {
        "metric": "v2_train_steps_per_s_per_chip",
        "value": round(steps_per_s, 4),
        "unit": "steps/s/chip",
        # target: streaming decode RTF < 0.05/chip -> report headroom as
        # the baseline ratio proxy (no published reference numbers exist)
        "vs_baseline": round(0.05 / rtf, 3) if rtf > 0 else None,
        "extras": {
            "stream_decode_rtf": round(rtf, 5),
            "batch": 8,
            "n_signal": 131072,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
