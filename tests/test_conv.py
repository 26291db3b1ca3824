"""Offline == streaming equivalence for the conv engine.

This replicates the reference's most important test idiom
(``tests/test_residual.py:39-122``): build the same layer offline and
streaming, run chunked streaming, and assert equality after compensating
the statically-computed delay.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.ops.conv import Conv1d, ConvTranspose1d, Delay, StreamSetup
from rave_tpu.ops.delay import get_padding, plan_conv


def run_streaming(module, params, x, chunk):
    """Feed x through module in chunks, threading the cache.

    The chunk step is jitted once (a single compiled module) -- eager
    per-op dispatch is pathological on remote-compile backends.
    """
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


def check_equiv(off_mod, str_mod, x, chunk, delay_frames, stride=1, atol=1e-5):
    params = off_mod.init(jax.random.PRNGKey(1), x)["params"]
    y_off = off_mod.apply({"params": params}, x)
    y_str = run_streaming(str_mod, params, x, chunk)
    n = y_off.shape[1]
    d = delay_frames
    if d:
        a = np.asarray(y_off[:, :n - d])
        b = np.asarray(y_str[:, d:])
    else:
        a, b = np.asarray(y_off), np.asarray(y_str)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=atol, rtol=1e-4)


KS = [1, 3, 5, 7]
STRIDES = [1, 2, 4]
DILATIONS = [1, 3, 9]
MODES = ["centered", "causal"]


@pytest.mark.parametrize("k,s,mode", itertools.product(KS, STRIDES, MODES))
def test_conv_stream_equiv(k, s, mode):
    if (k - 1) + 1 < s:
        pytest.skip("kernel smaller than stride")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 4))
    ss_off = StreamSetup(mode=mode, streaming=False)
    ss_str = StreamSetup(mode=mode, streaming=True)
    off = Conv1d(features=6, kernel_size=k, stride=s, ss=ss_off)
    st = Conv1d(features=6, kernel_size=k, stride=s, ss=ss_str)
    check_equiv(off, st, x, chunk=16, delay_frames=st.out_delay, stride=s)


@pytest.mark.parametrize("d,mode", itertools.product(DILATIONS, MODES))
def test_dilated_conv_stream_equiv(d, mode):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 4))
    off = Conv1d(features=4, kernel_size=3, dilation=d,
                 ss=StreamSetup(mode=mode))
    st = Conv1d(features=4, kernel_size=3, dilation=d,
                ss=StreamSetup(mode=mode, streaming=True))
    check_equiv(off, st, x, chunk=32, delay_frames=st.out_delay)


@pytest.mark.parametrize("ratio", [2, 4, 8])
def test_conv_transpose_stream_equiv(ratio):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 4))
    off = ConvTranspose1d(features=3, kernel_size=2 * ratio, stride=ratio)
    st = ConvTranspose1d(features=3, kernel_size=2 * ratio, stride=ratio,
                         ss=StreamSetup(streaming=True))
    check_equiv(off, st, x, chunk=8, delay_frames=st.out_delay)


def test_conv_in_delay_alignment():
    """A strided conv fed by a delayed stream aligns to whole output frames."""
    for in_delay in [0, 1, 2, 3]:
        plan = plan_conv(4, stride=2, mode="centered", in_delay=in_delay)
        assert (in_delay + plan.pad_right + plan.extra) % 2 == 0
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 4))
        off = Conv1d(features=4, kernel_size=4, stride=2)
        st = Conv1d(features=4, kernel_size=4, stride=2, in_delay=in_delay,
                    ss=StreamSetup(streaming=True))
        params = off.init(jax.random.PRNGKey(1), x)["params"]
        y_off = off.apply({"params": params}, x)
        # pre-delay the input stream by in_delay frames, as if produced by
        # an upstream causal stack
        x_delayed = jnp.pad(x, ((0, 0), (in_delay, 0), (0, 0)))[:, :64]
        y_str = run_streaming(st, params, x_delayed, chunk=16)
        d = st.out_delay
        n = y_off.shape[1]
        np.testing.assert_allclose(np.asarray(y_off[:, :n - d]),
                                   np.asarray(y_str[:, d:]),
                                   atol=1e-5, rtol=1e-4)


def test_grouped_conv():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 8))
    m = Conv1d(features=8, kernel_size=5, groups=2)
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    y = m.apply({"params": params}, x)
    assert y.shape == (2, 32, 8)


def test_weight_norm_conv():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 8))
    m = Conv1d(features=8, kernel_size=3, weight_norm=True)
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    assert "v" in params and "g" in params
    y = m.apply({"params": params}, x)
    assert y.shape == (2, 32, 8)


def test_delay_line():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 40, 3))
    d = Delay(frames=5, ss=StreamSetup(streaming=True))
    y = run_streaming(d, {}, x, chunk=8)
    np.testing.assert_allclose(np.asarray(y[:, 5:]), np.asarray(x[:, :-5]),
                               atol=1e-6)


def test_get_padding_reference_values():
    # reference: cc.get_padding(3) == (1, 1); (7) == (3, 3);
    # (2r, r) for r=4 == (2, 2); causal puts all padding left
    assert get_padding(3) == (1, 1)
    assert get_padding(7) == (3, 3)
    assert get_padding(8, 4) == (2, 2)
    assert get_padding(3, mode="causal") == (2, 0)
    assert get_padding(2 * 4 + 1, 4) == (3, 2)
