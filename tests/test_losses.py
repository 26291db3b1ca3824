"""DSP / loss correctness: STFT vs scipy oracle, mel filterbank sanity,
GAN loss values, schedules."""
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.ops import losses as L
from rave_tpu.ops.stft import hann_window, mel_filterbank, stft


def test_stft_matches_numpy_oracle():
    """Center=True reflect-padded hann STFT == a direct numpy loop
    (torch.stft conventions, reference stft_loss.py:23-30)."""
    rng = np.random.default_rng(0)
    T, n_fft, hop = 1024, 256, 64
    x = rng.standard_normal(T).astype(np.float32)

    s = np.asarray(stft(jnp.asarray(x)[None], n_fft, hop))[0]

    win = hann_window(n_fft)
    xp = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    frames = []
    for i in range(0, len(xp) - n_fft + 1, hop):
        frames.append(np.fft.rfft(xp[i:i + n_fft] * win))
    ref = np.stack(frames)
    assert s.shape == ref.shape
    np.testing.assert_allclose(np.abs(s), np.abs(ref), atol=1e-3, rtol=1e-3)


def test_stft_win_length_padding():
    x = jnp.asarray(np.random.default_rng(1).standard_normal(2048),
                    jnp.float32)[None]
    s = stft(x, 1024, 256, win_length=600)
    assert s.shape[-1] == 513


def test_mel_filterbank_shape_and_coverage():
    mel = mel_filterbank(44100, 1024, 80)
    assert mel.shape == (80, 513)
    # every filter has some support; triangles cover the spectrum
    assert (mel.sum(axis=1) > 0).all()


def test_gan_losses_reference_values():
    real = jnp.asarray([2.0])
    fake = jnp.asarray([-2.0])
    d, g = L.hinge_gan(real, fake)
    assert float(d) == 0.0  # both beyond margin
    assert float(g) == 2.0
    d, g = L.ls_gan(jnp.asarray([1.0]), jnp.asarray([0.0]))
    assert float(d) == 0.0
    assert float(g) == 1.0


def test_audio_distance_zero_for_identical():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 2048)),
                    jnp.float32)
    d = L.audio_distance_v1(x, x, scales=(512, 256))
    assert float(d) < 1e-5


def test_mr_stft_resolutions_match_reference():
    # reference model.py:191-196 at 44100
    res = L.mr_stft_resolutions(44100)
    assert res == [(2048, 220, 1102), (4096, 441, 2205), (512, 88, 441)]


def test_beta_schedule():
    from rave_tpu.config import build_config
    from rave_tpu.train import schedules
    cfg = build_config(["v3"])
    b0 = float(schedules.beta_factor(0, cfg))
    bmid = float(schedules.beta_factor(10000, cfg))
    bend = float(schedules.beta_factor(30000, cfg))
    assert b0 < bmid < bend
    assert abs(bend - cfg.beta_target) < 1e-9


def test_mod_sigmoid():
    v = float(L.mod_sigmoid(jnp.asarray(0.0)))
    assert abs(v - 2 * 0.5 ** 2.3) < 1e-6


def test_amp_to_ir_and_fft_convolve_shapes():
    amp = jnp.ones((2, 3, 4, 9))
    ir = L.amp_to_impulse_response(amp, 32)
    assert ir.shape == (2, 3, 4, 32)
    sig = jnp.ones((2, 3, 4, 32))
    out = L.fft_convolve(sig, ir)
    assert out.shape == (2, 3, 4, 32)


def test_encodec_distance_properties():
    from rave_tpu.ops.losses import encodec_audio_distance
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4096))
    d0 = encodec_audio_distance(x, x, scales=(256, 512))
    assert float(d0["waveform_distance"]) == 0.0
    assert float(d0["spectral_distance"]) == 0.0
    y = x + 0.1 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    d1 = encodec_audio_distance(x, y, scales=(256, 512))
    assert float(d1["waveform_distance"]) > 0
    assert float(d1["spectral_distance"]) > 0


def test_instantaneous_frequency_distance():
    """Pure tones at different frequencies differ mainly in IF; the same
    tone time-shifted by a whole period has ~zero phase distance
    (reference WeightedInstantaneousSpectralDistance, core.py:356-421)."""
    from rave_tpu.ops.losses import weighted_instantaneous_spectral_distance
    t = jnp.arange(8192) / 44100.0
    a = jnp.sin(2 * jnp.pi * 441.0 * t)[None]
    b = jnp.sin(2 * jnp.pi * 441.0 * (t + 100.0 / 44100.0))[None]
    c = jnp.sin(2 * jnp.pi * 882.0 * t)[None]
    d_same = weighted_instantaneous_spectral_distance(a, a, scales=(512,))
    d_shift = weighted_instantaneous_spectral_distance(a, b, scales=(512,))
    d_diff = weighted_instantaneous_spectral_distance(a, c, scales=(512,))
    assert float(d_same["phase_distance"]) == 0.0
    assert float(d_same["spectral_distance"]) == 0.0
    # same pitch, shifted -> far smaller IF distance than different pitch
    assert float(d_shift["phase_distance"]) < float(d_diff["phase_distance"])


def test_spectral_distance_mel_option():
    from rave_tpu.ops.losses import spectral_distance
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4096))
    y = jax.random.normal(jax.random.PRNGKey(3), (1, 4096))
    d = spectral_distance(x, y, 512, norms=("L1", "L2"), mel=64)
    assert float(d) > 0
    assert float(spectral_distance(x, x, 512, mel=64)) == 0.0


def test_mel_filterbank_htk_option():
    """htk=True/norm=None reproduces the torchaudio MelSpectrogram
    default basis the reference's hybrid front end uses (htk formula:
    mel = 2595 log10(1 + f/700); triangular, unnormalised)."""
    import numpy as np
    from rave_tpu.ops.stft import mel_filterbank
    fb = mel_filterbank(16000, 512, 32, htk=True, norm=None)
    assert fb.shape == (32, 257)
    # unnormalised triangles peak at 1
    assert 0.97 <= fb.max() <= 1.0
    # htk mel centers: f_m = 700 (10^(m/2595) - 1) on a linear mel grid
    lo, hi = 0.0, 8000.0
    m = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    inv = lambda mm: 700.0 * (10.0 ** (mm / 2595.0) - 1.0)
    centers = inv(np.linspace(m(lo), m(hi), 34))[1:-1]
    peak_bins = fb.argmax(axis=1) * (8000.0 / 256)
    # peaks land on the analytic centers within one fft bin
    np.testing.assert_allclose(peak_bins, centers, atol=8000.0 / 256)
    # default stays slaney/slaney (loss-side MelScale parity unchanged)
    fb_s = mel_filterbank(16000, 512, 32)
    assert fb_s.max() < 0.2  # slaney-normalised triangles are small
