"""Discriminator-specific tests.

The F-packed Encodec spectral-disc formulation (models/discriminators.py
``_f_packed_conv2d``) must be numerically identical to the native 2D conv
with the SAME parameters — packing is a trace-time weight regrouping, not
a different model (reference ``rave/discriminator.py:54-74`` defines the
native semantics).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.models.discriminators import (
    EncodecConvNet,
    MultiScaleSpectralDiscriminator,
    _f_packed_conv2d,
)


@pytest.mark.parametrize("kh,kw,sh,dw,p", [
    (9, 3, 1, 1, 8),
    (9, 3, 2, 1, 8),
    (9, 3, 2, 2, 8),
    (9, 3, 2, 4, 8),
    (3, 3, 1, 1, 4),
    (3, 3, 1, 1, 8),   # non-minimal packing factor
    (5, 3, 2, 1, 4),
])
def test_f_packed_conv2d_matches_native(kh, kw, sh, dw, p):
    key = jax.random.PRNGKey(0)
    B, F, T, Ci, Co = 2, 37, 23, 3, 5
    x = jax.random.normal(key, (B, F, T, Ci))
    w = jax.random.normal(jax.random.PRNGKey(1), (kh, kw, Ci, Co)) * 0.3
    ph, pw = (kh - 1) // 2, (kw - 1) * dw // 2
    ref = jax.lax.conv_general_dilated(
        x, w, (sh, 1), padding=[(ph, ph), (pw, pw)],
        rhs_dilation=(1, dw), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = _f_packed_conv2d(x, w, sh, dw, ph, pw, p)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_f_packed_conv2d_gradients_match():
    key = jax.random.PRNGKey(2)
    B, F, T, Ci, Co = 1, 19, 11, 2, 4
    kh, kw, sh, dw, p = 9, 3, 2, 2, 8
    ph, pw = (kh - 1) // 2, (kw - 1) * dw // 2
    x = jax.random.normal(key, (B, F, T, Ci))
    w = jax.random.normal(jax.random.PRNGKey(3), (kh, kw, Ci, Co)) * 0.3

    def loss_native(w):
        y = jax.lax.conv_general_dilated(
            x, w, (sh, 1), padding=[(ph, ph), (pw, pw)],
            rhs_dilation=(1, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.sin(y))

    def loss_packed(w):
        return jnp.sum(jnp.sin(_f_packed_conv2d(x, w, sh, dw, ph, pw, p)))

    ga = jax.grad(loss_native)(w)
    gb = jax.grad(loss_packed)(w)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=1e-5, atol=1e-5)


def test_encodec_convnet_packed_parity():
    """packed=True/False share a param tree and produce the same feats."""
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 65, 30, 2))
    net_p = EncodecConvNet(capacity=8, packed=True)
    net_n = EncodecConvNet(capacity=8, packed=False)
    params = net_p.init(jax.random.PRNGKey(5), x)
    feats_p = net_p.apply(params, x)
    feats_n = net_n.apply(params, x)
    assert len(feats_p) == len(feats_n) == 6
    for a, b in zip(feats_p, feats_n):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_multiscale_spectral_packed_parity():
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 8192, 1)) * 0.3
    d_p = MultiScaleSpectralDiscriminator(
        scales=(1024, 512), capacity=4, packed=True)
    d_n = MultiScaleSpectralDiscriminator(
        scales=(1024, 512), capacity=4, packed=False)
    params = d_p.init(jax.random.PRNGKey(7), x)
    out_p = d_p.apply(params, x)
    out_n = d_n.apply(params, x)
    for fl_p, fl_n in zip(out_p, out_n):
        for a, b in zip(fl_p, fl_n):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
