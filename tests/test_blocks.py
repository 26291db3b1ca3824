"""Streaming == offline equivalence for composite blocks (the reference's
strictest test idiom, ``tests/test_residual.py:39-122``), plus shape
checks for the encoder/generator pairs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.models.blocks import (EncoderV2, GeneratorV2, ResidualLayer,
                                    ResidualStack, UpsampleLayer)
from rave_tpu.ops.conv import StreamSetup

OFF = StreamSetup()
ST = StreamSetup(streaming=True)


def run_streaming(module, params, x, chunk):
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x[:, :chunk])
    cache = jax.tree.map(jnp.zeros_like, variables.get("cache", {}))

    @jax.jit
    def step(cache, xc):
        y, upd = module.apply({"params": params, "cache": cache}, xc,
                              mutable=["cache"])
        return y, upd["cache"]

    outs = []
    for i in range(0, x.shape[1], chunk):
        y, cache = step(cache, x[:, i:i + chunk])
        outs.append(y)
    return jnp.concatenate(outs, axis=1)


def check(off, st, x, chunk, delay, up_ratio=1, atol=2e-4):
    """Reference idiom (tests/test_residual.py:59-68): compare
    y_off[d:-d] vs y_str[2d:] -- the first d aligned frames differ by
    construction (offline zero-pads intermediates; streaming propagates
    computed pre-signal values)."""
    params = jax.jit(off.init)(jax.random.PRNGKey(1), x)["params"]
    y_off = jax.jit(off.apply)({"params": params}, x)
    y_str = run_streaming(st, params, x, chunk)
    d = delay
    if d:
        a = np.asarray(y_off[:, d:-d])
        b = np.asarray(y_str[:, 2 * d:])
    else:
        a, b = np.asarray(y_off), np.asarray(y_str)
    np.testing.assert_allclose(a, b, atol=atol, rtol=1e-3)


def test_residual_layer_stream():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 8))
    kw = dict(dim=8, kernel_size=3, dilations=(1, 1))
    off = ResidualLayer(ss=OFF, **kw)
    st = ResidualLayer(ss=ST, **kw)
    check(off, st, x, 16, st.out_delay)


def test_residual_stack_stream():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 8))
    kw = dict(dim=8, kernel_sizes=(3,), dilations_list=((1, 1), (3, 1), (5, 1)))
    off = ResidualStack(ss=OFF, **kw)
    st = ResidualStack(ss=ST, **kw)
    check(off, st, x, 16, st.out_delay)


@pytest.mark.parametrize("ratio", [2, 4])
def test_upsample_layer_stream(ratio):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 8))
    kw = dict(in_dim=8, out_dim=8, ratio=ratio)
    off = UpsampleLayer(ss=OFF, **kw)
    st = UpsampleLayer(ss=ST, **kw)
    check(off, st, x, 8, st.out_delay)


ENC_KW = dict(data_size=4, capacity=4, ratios=(2, 2), latent_size=4,
              n_out=1, kernel_size=3, dilations=((1, 3), (1, 3)))


def test_encoder_v2_stream():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 4))
    off = EncoderV2(ss=OFF, **ENC_KW)
    st = EncoderV2(ss=ST, **ENC_KW)
    params = jax.jit(off.init)(jax.random.PRNGKey(1), x)["params"]
    y_off = jax.jit(off.apply)({"params": params}, x)
    assert y_off.shape == (1, 32, 4)
    y_str = run_streaming(st, params, x, 32)
    d = st.out_delay
    np.testing.assert_allclose(np.asarray(y_off[:, d:32 - d]),
                               np.asarray(y_str[:, 2 * d:]),
                               atol=2e-4, rtol=1e-3)


GEN_KW = dict(data_size=4, capacity=4, ratios=(2, 2), latent_size=4,
              kernel_size=3, dilations=((1, 3), (1, 3)),
              amplitude_modulation=True)


def test_generator_v2_stream():
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 4))
    off = GeneratorV2(ss=OFF, **GEN_KW)
    st = GeneratorV2(ss=ST, **GEN_KW)
    params = jax.jit(off.init)(jax.random.PRNGKey(1), z)["params"]
    y_off = jax.jit(off.apply)({"params": params}, z)
    assert y_off.shape == (1, 128, 4)
    y_str = run_streaming(st, params, z, 8)
    d = st.out_delay
    np.testing.assert_allclose(np.asarray(y_off[:, d:128 - d]),
                               np.asarray(y_str[:, 2 * d:]),
                               atol=2e-4, rtol=1e-3)


def test_causal_encoder_zero_delay():
    """Causal graphs stream with zero delay (reference causal.gin)."""
    ss_off = StreamSetup(mode="causal")
    ss_st = StreamSetup(mode="causal", streaming=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 4))
    off = EncoderV2(ss=ss_off, **ENC_KW)
    st = EncoderV2(ss=ss_st, **ENC_KW)
    assert st.out_delay == 0
    params = jax.jit(off.init)(jax.random.PRNGKey(1), x)["params"]
    y_off = jax.jit(off.apply)({"params": params}, x)
    y_str = run_streaming(st, params, x, 32)
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(y_str),
                               atol=2e-4, rtol=1e-3)
