"""PQMF correctness: numpy oracle parity + round-trip + streaming equiv.

The oracle reimplements the reference ``CachedPQMF`` math
(``rave/pqmf.py:234-284``) directly in numpy (strided correlation), so we
verify bit-level agreement of the TPU formulation without torch.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.ops.conv import StreamSetup
from rave_tpu.ops.pqmf import (PQMF, center_pad_next_pow_2, get_prototype,
                               get_qmf_bank)


def oracle_bank(attenuation, n_band):
    h = get_prototype(attenuation, n_band)
    hk = center_pad_next_pow_2(get_qmf_bank(h, n_band))
    return hk  # (M, L)


def oracle_forward(x, hk):
    """Reference CachedPQMF.forward: conv(x, make_odd(hk), stride=M,
    pad=(L'//2, L'//2)) then reverse_half.  x: (T,) -> (M, T/M)."""
    M, L = hk.shape
    hkf = np.pad(hk, [(0, 0), (0, 1)])  # make_odd
    Lp = L + 1
    pad = (Lp - 1) // 2
    xp = np.pad(x, (pad, pad))
    T_out = x.shape[-1] // M
    y = np.zeros((M, T_out))
    for t in range(T_out):
        seg = xp[t * M:t * M + Lp]
        y[:, t] = hkf @ seg
    # reverse_half: odd bands, even frames
    y[1::2, ::2] *= -1
    return y


def oracle_inverse(y, hk):
    """Reference CachedPQMF.inverse (``pqmf.py:275-284``)."""
    M, L = hk.shape
    y = y.copy()
    y[1::2, ::2] *= -1
    hki = hk[:, ::-1]
    taps = L // M
    # rearrange "c (t m) -> m c t"
    H = np.zeros((M, M, taps))
    for m in range(M):
        for q in range(taps):
            H[m, :, q] = hki[:, q * M + m]
    H = np.pad(H, [(0, 0), (0, 0), (0, 1)])  # make_odd
    Lp = taps + 1
    pad = (Lp - 1) // 2
    yp = np.pad(y, [(0, 0), (pad, pad)])
    T = y.shape[-1]
    ph = np.zeros((M, T))
    for t in range(T):
        seg = yp[:, t:t + Lp]
        ph[:, t] = np.einsum("mct,ct->m", H, seg)
    ph *= M
    ph = ph[::-1]  # flip(1)
    # interleave phases fastest: (M, T) -> (T*M,)
    return ph.T.reshape(-1)


@pytest.fixture(scope="module")
def bank():
    return oracle_bank(100.0, 16)


def test_forward_matches_oracle(bank):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float64)
    ref = oracle_forward(x, bank)  # (M, T/M)

    m = PQMF(attenuation=100.0, n_band=16)
    xj = jnp.asarray(x, jnp.float32).reshape(1, -1, 1)
    vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), xj)
    y = jax.jit(m.apply)(vars_, xj)  # (1, T/M, M)
    got = np.asarray(y[0]).T
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_inverse_matches_oracle(bank):
    rng = np.random.default_rng(1)
    yb = rng.standard_normal((16, 128)).astype(np.float64) * 0.3
    ref = oracle_inverse(yb, bank)

    m = PQMF(attenuation=100.0, n_band=16)
    dummy = jnp.zeros((1, 2048, 1), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), dummy)
    got = m.apply(vars_, jnp.asarray(yb.T, jnp.float32)[None],
                  method=PQMF.inverse)
    np.testing.assert_allclose(np.asarray(got[0, :, 0]), ref,
                               atol=2e-5, rtol=1e-4)


def test_round_trip_snr():
    """Analysis+synthesis ~ delayed identity.

    NOTE: the reference's ``CachedPQMF`` round trip is itself ~60 dB SNR
    (verified against a float64 numpy oracle of ``rave/pqmf.py:234-284``:
    the ``make_odd`` padding costs the last ~40 dB of the 100 dB filter
    design).  We assert parity with that behaviour (> 55 dB, exact
    one-frame shift), not the theoretical design attenuation."""
    rng = np.random.default_rng(2)
    T = 8192
    x = rng.standard_normal(T).astype(np.float32) * 0.5
    m = PQMF(attenuation=100.0, n_band=16)
    xj = jnp.asarray(x).reshape(1, -1, 1)
    vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), xj)
    y = jax.jit(m.apply)(vars_, xj)
    rec = np.asarray(m.apply(vars_, y, method=PQMF.inverse))[0, :, 0]
    # find the round-trip delay by cross-correlation
    corr = np.correlate(rec, x, "full")
    shift = int(np.argmax(np.abs(corr))) - (T - 1)
    assert shift == 16, f"round-trip delay changed: {shift}"
    margin = 1024  # exclude zero-padding edge effects
    a = x[margin:T - shift - margin]
    b = rec[shift + margin:T - margin]
    err = a - b
    snr = 10 * np.log10(np.sum(a ** 2) / np.sum(err ** 2))
    assert snr > 55, f"PQMF round-trip SNR too low: {snr:.1f} dB (shift {shift})"


def test_streaming_equiv():
    rng = np.random.default_rng(3)
    T = 4096
    x = jnp.asarray(rng.standard_normal(T).astype(np.float32)).reshape(1, -1, 1)
    off = PQMF(attenuation=100.0, n_band=16)
    st = PQMF(attenuation=100.0, n_band=16, ss=StreamSetup(streaming=True))

    vars_off = off.init(jax.random.PRNGKey(0), x)
    y_off = off.apply(vars_off, x)

    chunk = 512
    vs = jax.jit(st.init)(jax.random.PRNGKey(0), x[:, :chunk])
    cache = jax.tree.map(jnp.zeros_like, vs.get("cache", {}))

    @jax.jit
    def step(cache, xc):
        y, upd = st.apply({"cache": cache}, xc, mutable=["cache"])
        return y, upd["cache"]

    outs = []
    for i in range(0, T, chunk):
        y, cache = step(cache, x[:, i:i + chunk])
        outs.append(y)
    y_str = jnp.concatenate(outs, axis=1)

    d = st.delay_frames
    a = np.asarray(y_off[:, :y_off.shape[1] - d])
    b = np.asarray(y_str[:, d:])
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_n_band_1_identity():
    x = jnp.ones((1, 64, 1))
    m = PQMF(n_band=1)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    assert np.allclose(m.apply(vars_, x), x)
