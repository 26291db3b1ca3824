"""Resampler round trip (reference ``tests/test_resampler.py:11-38``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.ops.conv import StreamSetup
from rave_tpu.ops.resampler import Resampler


@pytest.mark.parametrize("ratio", [2, 4])
def test_round_trip_shapes_and_content(ratio):
    sr = 4000
    m = Resampler(target_sr=sr * ratio, model_sr=sr)
    t = np.arange(4096) / (sr * ratio)
    x = np.sin(2 * np.pi * 200 * t).astype(np.float32)[None, :, None]
    xj = jnp.asarray(x)
    v = m.init(jax.random.PRNGKey(0), xj)
    down = m.apply(v, xj, method=Resampler.to_model_sr)
    assert down.shape == (1, 4096 // ratio, 1)
    up = m.apply(v, down, method=Resampler.from_model_sr)
    assert up.shape == x.shape
    # mid-band sine should survive the round trip with ~unit gain
    a = np.asarray(up[0, 1024:3072, 0])
    b = x[0, 1024:3072, 0]
    # allow group delay: align by cross-correlation
    corr = np.correlate(a, b, "full")
    shift = int(np.argmax(np.abs(corr))) - (len(b) - 1)
    if shift > 0:
        a2, b2 = a[shift:], b[:len(b) - shift]
    else:
        a2, b2 = a[:len(a) + shift], b[-shift:]
    gain = np.dot(a2, b2) / np.dot(b2, b2)
    assert 0.8 < gain < 1.2, f"gain {gain}"


def test_streaming_matches_offline():
    ratio, sr = 2, 4000
    off = Resampler(target_sr=sr * ratio, model_sr=sr)
    st = Resampler(target_sr=sr * ratio, model_sr=sr,
                   ss=StreamSetup(streaming=True))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(2048),
                    jnp.float32)[None, :, None]
    v = off.init(jax.random.PRNGKey(0), x)
    y_off = off.apply(v, x, method=Resampler.to_model_sr)

    vs = jax.jit(st.init)(jax.random.PRNGKey(0), x[:, :256])
    cache = jax.tree.map(jnp.zeros_like, vs.get("cache", {}))

    @jax.jit
    def step(cache, xc):
        y, upd = st.apply({"cache": cache}, xc,
                          method=Resampler.to_model_sr, mutable=["cache"])
        return y, upd["cache"]

    outs = []
    for i in range(0, 2048, 256):
        y, cache = step(cache, x[:, i:i + 256])
        outs.append(y)
    y_str = jnp.concatenate(outs, axis=1)
    from rave_tpu.ops.delay import plan_conv
    from rave_tpu.ops.resampler import _filters
    down, _ = _filters(ratio)
    d = plan_conv(down.shape[0], ratio).out_delay
    n = y_off.shape[1]
    np.testing.assert_allclose(np.asarray(y_off[:, :n - d]),
                               np.asarray(y_str[:, d:]), atol=1e-5)
