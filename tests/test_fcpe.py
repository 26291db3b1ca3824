"""FCPE neural pitch estimator (models/pitch_fcpe.py).

The reference's operative f0 estimator is torchfcpe's CFNaiveMelPE
(``rave/pitch_utils.py:133-143``).  ``torchfcpe`` itself is not in the
image, so the architecture is validated against a torch mirror built
here with the exact module layout the converter expects (GLU/depthwise/
GroupNorm/weight-norm semantics), plus decoder-math unit tests.  When a
real checkpoint is present (RAVE_TPU_FCPE_CKPT), a gated test converts
and runs it.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rave_tpu.models import pitch_fcpe as F


def test_cent_f0_roundtrip():
    f0 = np.array([50.0, 110.0, 440.0, 1000.0])
    cents = F.f0_to_cent(f0)
    back = np.asarray(F.cent_to_f0(jnp.asarray(cents)))
    np.testing.assert_allclose(back, f0, rtol=1e-5)


def test_decode_local_argmax_peak_and_threshold():
    lat = np.full((1, 3, F.OUT_DIMS), 1e-4, np.float32)
    lat[0, :, 100] = 0.9
    f = np.asarray(F.decode_local_argmax(jnp.asarray(lat)))
    want = float(F.cent_to_f0(jnp.asarray(F.cent_table()[100])))
    np.testing.assert_allclose(f, want, rtol=1e-3)
    # all-low confidence -> unvoiced 0
    lat2 = np.full((1, 2, F.OUT_DIMS), 1e-4, np.float32)
    assert np.all(np.asarray(F.decode_local_argmax(jnp.asarray(lat2))) == 0)


def test_resample_preserves_frequency():
    sr = 44100
    t = np.arange(sr) / sr
    s = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    y = np.asarray(F.resample_to(jnp.asarray(s), sr, 16000))
    assert y.shape == (1, 16000)
    zc = int(((y[0, :-1] < 0) & (y[0, 1:] >= 0)).sum())
    assert abs(zc - 440) <= 2


def test_fcpe_f0_shapes_and_jit():
    p = F.init_fcpe_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 16000)).astype(np.float32) * 0.1)
    f0 = jax.jit(lambda x: F.fcpe_f0(p, x, 16000, out_frames=50))(x)
    assert f0.shape == (2, 50)
    assert np.all(np.asarray(f0) >= 0)


def _torch_mirror(seed=0):
    """torchfcpe CFNaiveMelPE module layout (the state_dict keys the
    converter consumes), random weights."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(seed)

    class Transpose(tnn.Module):
        def forward(self, x):
            return x.transpose(1, 2)

    class DepthWise(tnn.Module):
        def __init__(self, dim, k):
            super().__init__()
            self.conv = tnn.Conv1d(dim, dim, k, groups=dim, padding=k // 2)

        def forward(self, x):
            return self.conv(x)

    class ConfBlock(tnn.Module):
        def __init__(self, dim=F.HIDDEN, inner=F.HIDDEN * F.EXPANSION):
            super().__init__()
            self.net = tnn.Sequential(
                tnn.LayerNorm(dim), Transpose(),
                tnn.Conv1d(dim, inner * 2, 1), tnn.GLU(dim=1),
                DepthWise(inner, F.KERNEL), tnn.SiLU(),
                tnn.Conv1d(inner, dim, 1), Transpose())

        def forward(self, x):
            return x + self.net(x)

    class Layer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conformer = ConfBlock()

        def forward(self, x):
            return self.conformer(x)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder_layers = tnn.ModuleList(
                [Layer() for _ in range(F.N_LAYERS)])

        def forward(self, x):
            for l in self.encoder_layers:
                x = l(x)
            return x

    class Model(tnn.Module):
        def __init__(self):
            super().__init__()
            self.input_stack = tnn.Sequential(
                tnn.Conv1d(F.N_MELS, F.HIDDEN, 3, padding=1),
                tnn.GroupNorm(4, F.HIDDEN), tnn.LeakyReLU(),
                tnn.Conv1d(F.HIDDEN, F.HIDDEN, 3, padding=1))
            self.net = Net()
            self.norm = tnn.LayerNorm(F.HIDDEN)
            self.output_proj = tnn.utils.weight_norm(
                tnn.Linear(F.HIDDEN, F.OUT_DIMS))

        def forward(self, mel):  # (B, T, n_mels)
            x = self.input_stack(mel.transpose(1, 2)).transpose(1, 2)
            x = self.net(x)
            x = self.norm(x)
            return torch.sigmoid(self.output_proj(x))

    return Model()


def test_converter_matches_torch_mirror(tmp_path):
    """convert_fcpe_checkpoint + fcpe_latent reproduce the torch module's
    forward on random weights -- validates every layout transposition and
    the GLU/depthwise/GroupNorm/weight-norm semantics."""
    import torch
    m = _torch_mirror()
    ck = tmp_path / "fcpe_test.pt"
    torch.save({"model": m.state_dict()}, ck)
    params = F.convert_fcpe_checkpoint(str(ck))

    mel = np.random.default_rng(1).standard_normal((2, 37, F.N_MELS)) \
        .astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(mel)).numpy()
    got = np.asarray(F.fcpe_latent(params, jnp.asarray(mel)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_converter_rejects_wrong_shape(tmp_path):
    import torch
    m = _torch_mirror()
    sd = m.state_dict()
    sd["input_stack.0.weight"] = torch.zeros(7, 7, 7)
    ck = tmp_path / "bad.pt"
    torch.save({"model": sd}, ck)
    with pytest.raises(ValueError, match="refusing to reshape|shape"):
        F.convert_fcpe_checkpoint(str(ck))


def test_pitch_feature_fcpe_fallback_warns():
    """estimator='fcpe' without a checkpoint falls back to YIN."""
    from rave_tpu.ops.pitch import pitch_feature
    import warnings
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((1, 8192, 1)).astype(np.float32) * 0.1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        feat = pitch_feature(x, 16, 44100, estimator="fcpe",
                             fcpe_ckpt="/nonexistent/fcpe.pt")
    assert feat.shape == (1, 16, 1)
    assert any("falling back" in str(x.message) for x in w)


def test_pitch_feature_fcpe_with_params(tmp_path):
    """End-to-end estimator='fcpe' with a (random-weight) converted ckpt
    through the training-path pitch_feature."""
    import torch
    from rave_tpu.ops.pitch import pitch_feature
    m = _torch_mirror(seed=3)
    ck = tmp_path / "fcpe_rand.pt"
    torch.save({"model": m.state_dict()}, ck)
    x = jnp.asarray(np.random.default_rng(3)
                    .standard_normal((1, 32768, 1)).astype(np.float32) * 0.1)
    feat = pitch_feature(x, 16, 44100, estimator="fcpe",
                         fcpe_ckpt=str(ck))
    assert feat.shape == (1, 16, 1)
    assert np.isfinite(np.asarray(feat)).all()


@pytest.mark.skipif(not os.environ.get("RAVE_TPU_FCPE_CKPT"),
                    reason="no real torchfcpe checkpoint in the image")
def test_real_fcpe_checkpoint_tracks_sine():
    """With a real fcpe_c_v001-style checkpoint: 220 Hz sine -> f0 ~220."""
    params = F.get_fcpe_params(os.environ["RAVE_TPU_FCPE_CKPT"])
    assert params is not None
    sr = 16000
    t = np.arange(sr) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 220 * t).astype(np.float32)[None])
    f0 = np.asarray(F.fcpe_f0(params, x, sr))
    voiced = f0[f0 > 0]
    assert len(voiced) > 10
    assert abs(np.median(voiced) - 220) < 10
