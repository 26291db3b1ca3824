"""Discriminator-specific tests.

The packed-resident Encodec spectral-disc chain
(models/discriminators.py ``_packed_chain_layer``) must be numerically
identical to the native 2D conv stack with the SAME parameters — packing
is a trace-time weight regrouping plus a static zero mask, not a
different model (reference ``rave/discriminator.py:54-74`` defines the
native semantics).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.models.discriminators import (
    EncodecConvNet,
    MultiScaleSpectralDiscriminator,
    PackedFeature,
    StackDiscriminators,
    _packed_chain_layer,
    pack_rows,
)
from rave_tpu.ops.losses import mean_difference


def _native_layer(x, w, b, sh, dw, ph, pw, slope):
    y = jax.lax.conv_general_dilated(
        x, w, (sh, 1), padding=[(ph, ph), (pw, pw)],
        rhs_dilation=(1, dw), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b
    if slope is not None:
        y = jnp.where(y >= 0, y, slope * y)
    return y


@pytest.mark.parametrize("kh,kw,sh,dw,p", [
    (9, 3, 1, 1, 8),
    (9, 3, 2, 1, 8),
    (9, 3, 2, 2, 4),
    (9, 3, 2, 4, 2),
    (3, 3, 1, 1, 1),
    (3, 3, 1, 1, 4),
])
def test_packed_chain_layer_matches_native(kh, kw, sh, dw, p):
    key = jax.random.PRNGKey(0)
    B, F, T, Ci, Co = 2, 37, 23, 3, 5
    x = jax.random.normal(key, (B, F, T, Ci))
    w = jax.random.normal(jax.random.PRNGKey(1), (kh, kw, Ci, Co)) * 0.3
    b = jax.random.normal(jax.random.PRNGKey(2), (Co,)) * 0.1
    ph, pw = (kh - 1) // 2, (kw - 1) * dw // 2
    ref = _native_layer(x, w, b, sh, dw, ph, pw, 0.2)
    a = pack_rows(x, p)
    y, pout, Fo, o = _packed_chain_layer(a, w, b, p, F, 0, sh, dw, ph, pw, 0.2)
    assert Fo == ref.shape[1]
    got = PackedFeature(y, valid_rows=Fo, pout=pout, offset=o).unpack()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_packed_chain_layer_gradients_match():
    key = jax.random.PRNGKey(2)
    B, F, T, Ci, Co = 1, 19, 11, 2, 4
    kh, kw, sh, dw, p = 9, 3, 2, 2, 8
    ph, pw = (kh - 1) // 2, (kw - 1) * dw // 2
    x = jax.random.normal(key, (B, F, T, Ci))
    w = jax.random.normal(jax.random.PRNGKey(3), (kh, kw, Ci, Co)) * 0.3
    b = jnp.zeros((Co,))

    def loss_native(w):
        return jnp.sum(jnp.sin(_native_layer(x, w, b, sh, dw, ph, pw, 0.2)))

    def loss_packed(w):
        a = pack_rows(x, p)
        y, pout, Fo, o = _packed_chain_layer(a, w, b, p, F, 0, sh, dw,
                                             ph, pw, 0.2)
        return jnp.sum(jnp.sin(PackedFeature(y, Fo, pout, o).unpack()))

    ga = jax.grad(loss_native)(w)
    gb = jax.grad(loss_packed)(w)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=1e-5, atol=1e-5)


def _unpack(f):
    return f.unpack() if isinstance(f, PackedFeature) else f


def test_encodec_convnet_packed_parity():
    """packed=True/False share a param tree and produce the same feats."""
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 65, 30, 2))
    net_p = EncodecConvNet(capacity=8, packed=True)
    net_n = EncodecConvNet(capacity=8, packed=False)
    params = net_p.init(jax.random.PRNGKey(5), x)
    params_n = net_n.init(jax.random.PRNGKey(5), x)
    assert (jax.tree.structure(params) == jax.tree.structure(params_n))
    feats_p = net_p.apply(params, x)
    feats_n = net_n.apply(params, x)
    assert len(feats_p) == len(feats_n) == 6
    for a, b in zip(feats_p, feats_n):
        a = _unpack(a)
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
            np.testing.assert_allclose(np.asarray(_unpack(a)),
                                       np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("norm,relative", [
    ("L1", False), ("L2", False), ("L1", True), ("L2", True),
])
def test_mean_difference_on_packed_features(norm, relative):
    """mean_difference over a PackedFeature equals the native value:
    zero padding rows cancel; only the denominator needs the static
    correction (which cancels in relative mode)."""
    kh, kw, sh, dw, p = 9, 3, 2, 1, 8
    B, F, T, Ci, Co = 2, 29, 13, 2, 3
    ph, pw = (kh - 1) // 2, (kw - 1) * dw // 2
    xa = jax.random.normal(jax.random.PRNGKey(8), (B, F, T, Ci))
    xb = xa + 0.1 * jax.random.normal(jax.random.PRNGKey(9), xa.shape)
    w = jax.random.normal(jax.random.PRNGKey(10), (kh, kw, Ci, Co)) * 0.3
    b = jnp.ones((Co,)) * 0.05

    def both(x):
        nat = _native_layer(x, w, b, sh, dw, ph, pw, 0.2)
        y, pout, Fo, o = _packed_chain_layer(pack_rows(x, p), w, b, p,
                                             F, 0, sh, dw, ph, pw, 0.2)
        return nat, PackedFeature(y, Fo, pout, o)

    na, pa = both(xa)
    nb_, pb = both(xb)
    want = mean_difference(na, nb_, norm, relative)
    got = mean_difference(pa, pb, norm, relative)
    np.testing.assert_allclose(float(got), float(want),
                               rtol=1e-5, atol=1e-6)


def test_univnet_mrd_packed_parity():
    """The packed-resident UnivNet MRD (reference rave/mrd.py:8-88)
    shares a param tree with the native formulation and produces the
    same features (it reuses the Encodec packed chain over the
    frequency-major spectrogram)."""
    from rave_tpu.models.discriminators import UnivNetResolutionDiscriminator
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 8192, 1)) * 0.3
    d_p = UnivNetResolutionDiscriminator(resolution=(5, 25), packed=True)
    d_n = UnivNetResolutionDiscriminator(resolution=(5, 25), packed=False)
    params = d_p.init(jax.random.PRNGKey(9), x)
    params_n = d_n.init(jax.random.PRNGKey(9), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_n)
    feats_p = d_p.apply(params, x)
    feats_n = d_n.apply(params, x)
    assert len(feats_p) == len(feats_n) == 6
    for a, b in zip(feats_p, feats_n):
        a = _unpack(a)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("k,ci,co,s,T", [
    (41, 16, 64, 4, 1024), (41, 1, 16, 4, 512), (15, 4, 8, 2, 256),
    (5, 32, 64, 3, 513 * 3)])
def test_phase_dx_matches_native(k, ci, co, s, T):
    """The phase-decomposed dx rule (custom VJP on strided 1D convs,
    the MelGAN-ladder backward fix) is numerically exact vs XLA's
    native gradient, for both dx and dw."""
    from rave_tpu.models.discriminators import _conv1d_strided
    pad = ((k - s + 1) // 2,) * 2
    x = jax.random.normal(jax.random.PRNGKey(0), (2, T, ci))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, ci, co)) * 0.1

    def native(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (s,), [pad], dimension_numbers=("NWC", "WIO", "NWC"))

    out_len = (T + 2 * pad[0] - k) // s + 1
    if out_len != T // s:
        pytest.skip("shape outside the gate (out_len != T//s)")
    y0 = native(x, w)
    y1 = _conv1d_strided(x, w, s, pad)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)

    def loss(f):
        return lambda x, w: jnp.sum(jnp.sin(f(x, w)))

    gx0, gw0 = jax.grad(loss(native), (0, 1))(x, w)
    gx1, gw1 = jax.grad(
        loss(lambda x, w: _conv1d_strided(x, w, s, pad)), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw0), np.asarray(gw1),
                               rtol=1e-4, atol=1e-5)


def test_melgan_grads_finite_with_phase_dx():
    """End-to-end gradient through the MelGAN stack (which now takes the
    phase-dx path for its early strided convs)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4096, 1)) * 0.1
    m = StackDiscriminators(n_dis=2, capacity=4, n_layers=2)
    params = m.init(jax.random.PRNGKey(1), x)

    def loss(p, x):
        return sum(jnp.mean(jnp.square(f)) for fl in m.apply(p, x)
                   for f in fl)

    gp, gx = jax.grad(loss, (0, 1))(params, x)
    for leaf in jax.tree.leaves((gp, gx)):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("k,co,T,pad", [
    (15, 16, 1024, (7, 7)), (15, 16, 513, (7, 7)), (4, 8, 256, (2, 1))])
def test_ci1_conv_matches_native(k, co, T, pad):
    """Shift-and-add single-input-channel conv (the MelGAN head fix):
    forward, dx and dw exact vs XLA's native conv."""
    from rave_tpu.models.discriminators import _conv1d_ci1
    x = jax.random.normal(jax.random.PRNGKey(0), (2, T, 1))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, 1, co)) * 0.1

    def native(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), [pad], dimension_numbers=("NWC", "WIO", "NWC"))

    np.testing.assert_allclose(np.asarray(native(x, w)),
                               np.asarray(_conv1d_ci1(x, w, pad)),
                               rtol=1e-5, atol=1e-5)

    def loss(f):
        return lambda x, w: jnp.sum(jnp.sin(f(x, w)))

    gx0, gw0 = jax.grad(loss(native), (0, 1))(x, w)
    gx1, gw1 = jax.grad(
        loss(lambda x, w: _conv1d_ci1(x, w, pad)), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw0), np.asarray(gw1),
                               rtol=1e-4, atol=1e-5)


def test_descript_mrd_packed_parity():
    """The packed-resident DescriptMRD (reference
    descript_discriminator.py:118-183) shares a param tree with the
    native per-band formulation and produces the same features (packed
    maps ride freq-major; unpack + transpose recovers the native
    orientation)."""
    from rave_tpu.models.discriminators import DescriptMRD
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4096, 1)) * 0.3
    d_p = DescriptMRD(window_length=512, packed=True)
    d_n = DescriptMRD(window_length=512, packed=False)
    params = d_p.init(jax.random.PRNGKey(1), x)
    params_n = d_n.init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(params) == jax.tree.structure(params_n)
    f_p = d_p.apply(params, x)
    f_n = d_n.apply(params, x)
    assert len(f_p) == len(f_n)
    for i, (a, b) in enumerate(zip(f_p, f_n)):
        if isinstance(a, PackedFeature):
            a = a.unpack()
        if i < len(f_p) - 1:
            # every packed-mode band feature rides freq-major
            # (orientation is invisible to the FM loss); only the final
            # post-concat conv is native. NB a shape test is not enough:
            # band4/conv1 is square (33 x 33).
            a = a.transpose(0, 2, 1, 3)
        assert a.shape == b.shape, (i, a.shape, b.shape)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    # gradients flow and are finite through the packed chain
    def loss(p):
        return sum(jnp.mean(jnp.square(
            f.data if isinstance(f, PackedFeature) else f))
            for f in d_p.apply(p, x))

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_spectral_1d_shapes_and_combine_member():
    """The dead-config leaf the reference binds but never combines
    (``discriminator.py:156-170``, ``configs/v2.gin:75-78``): complex
    STFT bins as 1d-conv channels, kernel 5 / stride 2 over frames."""
    from rave_tpu.models.discriminators import (
        CombineDiscriminators, MultiScaleSpectralDiscriminator1d,
        member_sub_count)

    d = MultiScaleSpectralDiscriminator1d(scales=(256, 128), capacity=4,
                                          n_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1024, 1))
    params = d.init(jax.random.PRNGKey(1), x)
    feats = d.apply(params, x)
    assert len(feats) == 2                      # one chain per scale
    for scale, chain in zip((256, 128), feats):
        assert len(chain) == 3                  # n_layers + final 1x1
        frames = (1024 - scale) // (scale // 4) + 1
        B, T, C = chain[0].shape
        assert B == 2 and C == 4                # capacity ladder start
        assert T == -(-frames // 2)             # stride 2
        assert chain[-1].shape[-1] == 1         # score head
    # too-short signal must raise, not silently train on empty frames
    with pytest.raises(ValueError):
        d.init(jax.random.PRNGKey(1), x[:, :100])

    c = CombineDiscriminators(members=("scales", "spectral_1d"),
                              capacity=4, spectral_scales=(256, 128))
    params = c.init(jax.random.PRNGKey(2), x)
    out = c.apply(params, x)
    assert len(out) == 3 + 2                    # 3 MSD + 2 spectral_1d
    assert member_sub_count("spectral_1d") == 5
