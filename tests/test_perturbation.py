"""Input-perturbation pipeline: native pitch/pitch-range shift (PSOLA),
formant warp, EQ, and their wiring into the training data path.

The perturbed encoder input is the voice-conversion fork's central
training mechanism (reference ``rave/dataset.py:258-289`` returns
``(clean, perturbed, speaker)``; ``rave/model.py:340-343`` encodes the
perturbed view) and the native shift must reproduce the Praat "Change
gender" semantics of ``rave/perturbation.py:97-170``: pitch median AND
pitch range shift, not just formants.
"""
import numpy as np
import pytest

from rave_tpu.data.perturbation import (Perturb, formant_shift_native,
                                        pitch_shift_native)
from rave_tpu.data.pitch import yin_f0

SR = 22050


def voiced_signal(seconds=2.0, f0=150.0, vib=10.0, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    f0t = f0 + vib * np.sin(2 * np.pi * 3 * t)
    phase = 2 * np.pi * np.cumsum(f0t) / sr
    return sum(0.5 / k * np.sin(k * phase) for k in range(1, 8)) \
        .astype(np.float32)


def f0_stats(x, sr=SR):
    f0 = yin_f0(x, sr, fmin=50, fmax=500)
    v = f0[f0 > 0]
    return float(np.median(v)), float(v.std()), len(v) / len(f0)


@pytest.mark.parametrize("ratio", [1.5, 0.7])
def test_pitch_shift_median_ratio(ratio):
    """YIN median f0 after the shift ~= median * ratio (the Praat
    ``new_pitch_median = median * pitch_shift_ratio`` semantics,
    reference perturbation.py:117)."""
    x = voiced_signal()
    med0, _, _ = f0_stats(x)
    y = pitch_shift_native(x, SR, pitch_ratio=ratio)
    assert y.shape == x.shape and np.isfinite(y).all()
    med1, _, voiced = f0_stats(y)
    assert voiced > 0.5, "shifted output lost periodicity"
    assert abs(med1 / (med0 * ratio) - 1) < 0.08, (med0, med1, ratio)


def test_pitch_range_ratio():
    """Range compression: contour spread scales by pitch_ratio *
    range_ratio around the new median (perturbation.py:124-125)."""
    x = voiced_signal(vib=12.0)
    med0, std0, _ = f0_stats(x)
    y = pitch_shift_native(x, SR, pitch_ratio=1.0, range_ratio=0.5)
    med1, std1, _ = f0_stats(y)
    assert abs(med1 / med0 - 1) < 0.05
    assert abs(std1 / (std0 * 0.5) - 1) < 0.35, (std0, std1)


def test_pitch_shift_guards():
    """Reference fallbacks (perturbation.py:119-132): unvoiced input and
    a negative resulting minimum leave the signal unshifted."""
    rng = np.random.default_rng(0)
    noise = (0.3 * rng.standard_normal(SR)).astype(np.float32)
    np.testing.assert_array_equal(pitch_shift_native(noise, SR, 1.5), noise)
    # huge downward range expansion drives the resulting minimum negative
    x = voiced_signal()
    y = pitch_shift_native(x, SR, pitch_ratio=0.5, range_ratio=30.0)
    np.testing.assert_array_equal(y, x)


def test_pitch_shift_preserves_formants():
    """PSOLA copies waveform grains, so the spectral envelope (formants)
    stays put while f0 moves -- unlike naive resampling."""
    sr = SR
    x = voiced_signal(f0=120, vib=5)
    # impose a strong formant at 1.8 kHz
    from scipy.signal import lfilter
    w0 = 2 * np.pi * 1800 / sr
    r = 0.97
    x = lfilter([1.0], [1, -2 * r * np.cos(w0), r ** 2], x)
    x = (x / np.abs(x).max() * 0.7).astype(np.float32)
    y = pitch_shift_native(x, sr, pitch_ratio=1.4)

    def peak_freq(s):
        S = np.abs(np.fft.rfft(s * np.hanning(len(s))))
        f = np.fft.rfftfreq(len(s), 1 / sr)
        band = (f > 800) & (f < 3200)
        return f[band][np.argmax(S[band])]

    assert abs(peak_freq(y) / peak_freq(x) - 1) < 0.12


def test_perturb_pipeline_changes_signal():
    rng = np.random.default_rng(0)
    x = voiced_signal()
    p = Perturb(SR)
    y = p(x, rng)
    assert y.shape == x.shape and np.isfinite(y).all()
    assert not np.allclose(y, x)
    assert np.abs(y).max() <= 1.0 + 1e-6


def test_formant_warp_moves_envelope():
    sr = SR
    x = voiced_signal(f0=120, vib=0)
    y = formant_shift_native(x, sr, 1.3)
    assert y.shape == x.shape and np.isfinite(y).all()
    assert not np.allclose(y, x)


# ---------------------------------------------------------------------
# wiring into the data/training path
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def db(tmp_path_factory):
    from rave_tpu.data.audio_io import save_wav
    from rave_tpu.data.dataset import preprocess
    root = tmp_path_factory.mktemp("paudio")
    rng = np.random.default_rng(0)
    for spk in ["s0", "s1"]:
        d = root / spk
        d.mkdir()
        x = voiced_signal(1.5, f0=110 if spk == "s0" else 180, sr=16000)
        x = x + 0.01 * rng.standard_normal(len(x)).astype(np.float32)
        save_wav(d / "a.wav", x.astype(np.float32), 16000)
    out = tmp_path_factory.mktemp("pdb")
    preprocess(str(root), str(out), n_signal=8192, sample_rate=16000,
               num_workers=1)
    return out


def test_dataset_perturbation_wired(db, tmp_path):
    from rave_tpu.data.dataset import AudioDataset, RandomBackgroundNoise
    # noise corpus: one pre-decoded .npy file
    nd = tmp_path / "noise"
    nd.mkdir()
    rng = np.random.default_rng(1)
    np.save(nd / "n.npy", 0.1 * rng.standard_normal(16000).astype(np.float32))

    ds = AudioDataset(str(db), phase_mangle_p=0.0, use_dequantize=False,
                      perturb=Perturb(16000),
                      noise=RandomBackgroundNoise(str(nd), 16000,
                                                  min_snr_db=14,
                                                  max_snr_db=15, p=1.0))
    item = ds[0]
    assert "x_perturbed" in item
    xp = item["x_perturbed"]
    assert xp.shape == item["x"].shape
    assert not np.allclose(xp, item["x"]), "perturbed view identical to clean"
    # reference normalises the perturbed view to 0.8 peak (dataset.py:287)
    assert abs(np.abs(xp).max() - 0.8) < 1e-3

    # without perturbation there is no x_perturbed key (and no device
    # transfer for it)
    ds2 = AudioDataset(str(db))
    assert "x_perturbed" not in ds2[0]


def test_loader_batch_has_perturbed_channelled(db):
    from rave_tpu.data.dataset import AudioDataset, DataLoader
    ds = AudioDataset(str(db), n_signal=4096, perturb=Perturb(16000))
    batch = next(iter(DataLoader(ds, 2)))
    assert batch["x_perturbed"].shape == (2, 4096, 1)
    assert not np.allclose(batch["x_perturbed"], batch["x"])


def test_fork_config_enables_perturbation():
    from rave_tpu.config import build_config
    assert build_config(["v2_fork"]).perturb_inputs
    assert not build_config(["v2"]).perturb_inputs


def test_fork_train_step_consumes_perturbed_batch(db):
    """End-to-end: a genuinely perturbed loader batch through the fork
    train step -- the encoder sees x_perturbed, losses compare clean x
    (reference model.py:328-343)."""
    import jax
    from rave_tpu.config import build_config
    from rave_tpu.data.dataset import AudioDataset, DataLoader
    from rave_tpu.train.loop import init_state, make_train_step

    cfg = build_config(["v2_fork"], [
        "capacity=4", "n_signal=4096", "batch_size=2",
        "sampling_rate=16000", "valid_signal_crop=false",
        "phase_1_duration=1000", "stft_scales=[512,256]",
        "mr_stft_specs_ms=[[5,25]]",
        "discriminator.kind=multi_scale", "discriminator.capacity=4",
        "discriminator.n_layers=2", "discriminator.member_weights=null",
    ])
    assert cfg.perturb_inputs
    ds = AudioDataset(str(db), n_signal=4096, perturb=Perturb(16000))
    batch = next(iter(DataLoader(ds, cfg.batch_size)))
    assert not np.allclose(batch["x_perturbed"], batch["x"])
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss_gen_total"]))
    # the perturbed view actually flowed into the encoder: gradients of
    # the step w.r.t. x_perturbed are nonzero by construction of the
    # fork path (encode_input consumes x_p, loop.py:190)


# ---------------- reference-parity of the parametric EQ ----------------

def _load_ref_perturbation():
    """Exec the reference's perturbation.py with a parselmouth stub (its
    EQ half is pure numpy/scipy math)."""
    import importlib.util
    import sys
    import types
    path = "/root/reference/rave/perturbation.py"
    import os
    if not os.path.exists(path):
        pytest.skip("reference checkout not present")
    saved = {}
    for s in ["parselmouth", "parselmouth.praat", "librosa",
              "torchaudio", "torchaudio.functional"]:
        saved[s] = sys.modules.get(s)
        sys.modules[s] = types.ModuleType(s)
    sys.modules["parselmouth"].praat = sys.modules["parselmouth.praat"]
    sys.modules["parselmouth"].Sound = object
    sys.modules["torchaudio"].functional = sys.modules[
        "torchaudio.functional"]
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_perturbation", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        # restore: leaving bare stubs in sys.modules breaks other tests'
        # own shims (test_reference_parity installs a faithful
        # torchaudio.Spectrogram only when the name is absent)
        for s, old in saved.items():
            if old is None:
                sys.modules.pop(s, None)
            else:
                sys.modules[s] = old
    return mod


@pytest.mark.parametrize("ftype,gain,f,q", [
    ("peak", 7.5, 1000.0, 3.0),
    ("peak", -11.0, 250.0, 2.2),
    ("low", 9.0, 60.0, 4.1),
    ("high", -6.0, 5965.0, 2.0),
])
def test_eq_biquad_matches_reference(ftype, gain, f, q):
    """Each biquad (coefficients + zi-initialised lfilter) is value-
    identical to the reference's apply_iir_filter
    (perturbation.py:270-303)."""
    from scipy.signal import lfilter, lfilter_zi
    from rave_tpu.data.perturbation import _peaking, _shelf
    ref = _load_ref_perturbation()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096)
    want = ref.apply_iir_filter(x.copy(), ftype=ftype, dBgain=gain,
                                cutoff_freq=f, sample_rate=SR, Q=q)
    if ftype == "peak":
        b, a = _peaking(f, SR, gain, q)
    else:
        b, a = _shelf(f, SR, gain, q, high=(ftype == "high"))
    zi = lfilter_zi(b, a) * x[0]
    got, _ = lfilter(b, a, x, zi=zi)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-9, atol=1e-10)


def test_random_eq_matches_reference_equalizer():
    """random_eq == the reference's parametric_equalizer when driven by
    the same random draws (center freqs at power-ratio spacing 60->10000,
    Q ~ power-ratio [2,5], gains U[-12,12], order peaks -> high shelf ->
    low shelf; perturbation.py:178-222)."""
    import random as pyrandom
    from rave_tpu.data.perturbation import random_eq
    ref = _load_ref_perturbation()
    rng = np.random.default_rng(1)
    x = rng.standard_normal(8192).astype(np.float32)

    # drive the reference with a recorded uniform stream, then replay
    # the same stream into random_eq through a scripted Generator
    draws = []
    real_uniform = pyrandom.uniform

    def record(a, b):
        v = real_uniform(a, b)
        draws.append((a, b, v))
        return v

    pyrandom.uniform = record
    try:
        want = ref.parametric_equalizer(x.copy().astype(np.float64), SR)
    finally:
        pyrandom.uniform = real_uniform

    class Replay:
        """Feeds random_eq the reference's exact draws: reference draws
        Q (u in [0,1]) x10 then gains x10; random_eq asks uniform() for
        Q-u and uniform(-12,12) for gain, filter by filter."""
        def __init__(self, draws):
            self.qs = [v for a, b, v in draws if (a, b) == (0, 1)]
            self.gains = [v for a, b, v in draws if (a, b) == (-12, 12)]

        def uniform(self, lo=0.0, hi=1.0):
            if (lo, hi) == (0.0, 1.0):
                return self.qs.pop(0)
            assert (lo, hi) == (-12.0, 12.0)
            return self.gains.pop(0)

    got = random_eq(x, Replay(draws), SR)
    np.testing.assert_allclose(got, np.asarray(want, np.float32),
                               rtol=2e-4, atol=2e-6)


def test_perturb_applies_eq_before_shift(monkeypatch):
    """Pipeline order matches the reference's perturb
    (perturbation.py:312-318): parametric EQ FIRST, then the
    formant/pitch shift."""
    import rave_tpu.data.perturbation as P
    calls = []
    monkeypatch.setattr(P, "random_eq",
                        lambda x, rng, sr: (calls.append("eq"), x)[1])
    monkeypatch.setattr(P, "random_formant_pitch",
                        lambda x, rng, sr: (calls.append("shift"), x)[1])
    x = np.zeros(1024, np.float32)
    P.Perturb(SR)(x, np.random.default_rng(0))
    assert calls == ["eq", "shift"]


# ---------------- precomputed perturbation variants --------------------

def test_precompute_perturbed_variants(db):
    """`rave-tpu perturb` stores N full-pipeline variants per record;
    the dataset then samples stored variants instead of running
    PSOLA+EQ per item (the few-core-host unblock: device step ~121 ms
    vs ~150 ms/item native perturbation)."""
    from rave_tpu.cli import main as cli_main
    from rave_tpu.data.dataset import AudioDataset
    from rave_tpu.data.perturbation import Perturb

    cli_main(["perturb", "--db_path", str(db), "--variants", "3",
              "--num_workers", "1"])
    import json
    meta = json.loads((db / "meta.json").read_text())
    assert meta["perturb_variants"] == 3
    stored = np.memmap(db / "perturbed.bin", dtype="<i2", mode="r",
                       shape=(meta["count"], 3, meta["n_signal"]))

    ds = AudioDataset(str(db), perturb=Perturb(meta["sample_rate"]))
    assert ds.perturbed is not None
    rng = np.random.default_rng(1)
    item = ds.get(0, rng)
    xp = item["x_perturbed"]
    assert xp.shape == item["x"].shape
    assert not np.allclose(xp, item["x"])
    # with no noise corpus the served view IS a stored variant up to the
    # 0.8 peak norm (scale-invariant cosine match against some variant)
    best = max(
        abs(np.dot(xp, v) / (np.linalg.norm(xp) * np.linalg.norm(v) + 1e-9))
        for v in (stored[0, k].astype(np.float32) / 32768.0 for k in range(3)))
    assert best > 0.999, best
    # variant draws vary across rng streams
    views = {ds.get(0, np.random.default_rng(s))["x_perturbed"].tobytes()
             for s in range(8)}
    assert len(views) > 1
    # a dataset opened WITHOUT perturbation ignores the stored variants
    ds_plain = AudioDataset(str(db))
    assert ds_plain.perturbed is None
    assert "x_perturbed" not in ds_plain.get(0, np.random.default_rng(0))


def test_preprocess_cli_perturb_variants(tmp_path):
    """preprocess --perturb_variants runs the precompute inline."""
    from rave_tpu.cli import main as cli_main
    from rave_tpu.data.audio_io import save_wav
    root = tmp_path / "audio"
    (root / "s0").mkdir(parents=True)
    save_wav(root / "s0" / "a.wav", voiced_signal(1.0, sr=16000), 16000)
    out = tmp_path / "db"
    cli_main(["preprocess", "--input_path", str(root),
              "--output_path", str(out), "--num_signal", "8192",
              "--sampling_rate", "16000", "--num_workers", "1",
              "--perturb_variants", "2"])
    import json
    meta = json.loads((out / "meta.json").read_text())
    assert meta["perturb_variants"] == 2
    assert (out / "perturbed.bin").exists()
