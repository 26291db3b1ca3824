"""Input perturbations for the voice-conversion training pipeline.

The reference perturbs the encoder input with Praat "Change gender"
formant/pitch shifts + a 10-filter parametric EQ
(``rave/perturbation.py:97-305``).  Praat (parselmouth) is unavailable in
this image, so:

* the parametric EQ is reimplemented natively (audio-EQ-cookbook biquads,
  same coefficient formulas as ``perturbation.py:178-305``),
* formant shifting is a native spectral-envelope warp (STFT
  envelope/excitation decomposition + frequency-axis rescale), standing in
  for Praat's PSOLA-based shift,
* if parselmouth IS importable, the Praat path is used (API-compatible).
"""

from __future__ import annotations

import numpy as np
from scipy.signal import lfilter, stft as sp_stft, istft as sp_istft

try:  # optional Praat backend
    import parselmouth  # type: ignore
    HAVE_PRAAT = True
except ImportError:
    HAVE_PRAAT = False


# ------------------- parametric EQ (biquads) --------------------------

def _peaking(f0, sr, gain_db, q):
    A = 10 ** (gain_db / 40)
    w0 = 2 * np.pi * f0 / sr
    alpha = np.sin(w0) / (2 * q)
    b = [1 + alpha * A, -2 * np.cos(w0), 1 - alpha * A]
    a = [1 + alpha / A, -2 * np.cos(w0), 1 - alpha / A]
    return np.asarray(b) / a[0], np.asarray(a) / a[0]


def _shelf(f0, sr, gain_db, q, high: bool):
    A = 10 ** (gain_db / 40)
    w0 = 2 * np.pi * f0 / sr
    alpha = np.sin(w0) / 2 * np.sqrt((A + 1 / A) * (1 / q - 1) + 2)
    cos = np.cos(w0)
    s = 1 if high else -1
    b0 = A * ((A + 1) + s * (A - 1) * cos + 2 * np.sqrt(A) * alpha)
    b1 = -2 * s * A * ((A - 1) + s * (A + 1) * cos)
    b2 = A * ((A + 1) + s * (A - 1) * cos - 2 * np.sqrt(A) * alpha)
    a0 = (A + 1) - s * (A - 1) * cos + 2 * np.sqrt(A) * alpha
    a1 = 2 * s * ((A - 1) - s * (A + 1) * cos)
    a2 = (A + 1) - s * (A - 1) * cos - 2 * np.sqrt(A) * alpha
    return np.asarray([b0, b1, b2]) / a0, np.asarray([a0, a1, a2]) / a0


def random_eq(x: np.ndarray, rng: np.random.Generator,
              sr: int = 44100, n_filters: int = 10,
              gain_range: float = 12.0) -> np.ndarray:
    """Random 10-band parametric EQ (reference ``perturbation.py:178-305``:
    low shelf + 8 peaking + high shelf, random gains/Qs)."""
    freqs = np.exp(np.linspace(np.log(60), np.log(min(10000, sr / 2 - 1000)),
                               n_filters))
    y = x
    for i, f in enumerate(freqs):
        g = rng.uniform(-gain_range, gain_range)
        q = rng.uniform(0.5, 2.0)
        if i == 0:
            b, a = _shelf(f, sr, g, q, high=False)
        elif i == n_filters - 1:
            b, a = _shelf(f, sr, g, q, high=True)
        else:
            b, a = _peaking(f, sr, g, q)
        y = lfilter(b, a, y)
    return y.astype(np.float32)


# ------------------- formant / pitch perturbation ---------------------

def _praat_change_gender(x, sr, formant_ratio, pitch_ratio, pitch_range):
    snd = parselmouth.Sound(x.astype(np.float64), sampling_frequency=sr)
    # new pitch median = measured median * ratio (0.0 = keep), with the
    # reference's negative-minimum / NaN fallbacks
    # (rave/perturbation.py:111-133)
    new_median = 0.0
    if pitch_ratio != 1.0:
        try:
            pitch = snd.to_pitch()
            median = parselmouth.praat.call(
                pitch, "Get quantile", 0.0, 0.0, 0.5, "Hertz")
            minimum = parselmouth.praat.call(
                pitch, "Get minimum", 0.0, 0.0, "Hertz", "Parabolic")
            new_median = median * pitch_ratio
            res_min = new_median + (minimum * pitch_ratio
                                    - new_median) * pitch_range
            if res_min < 0 or not np.isfinite(new_median):
                new_median, pitch_range = 0.0, 1.0
        except Exception:
            new_median, pitch_range = 0.0, 1.0
    out = parselmouth.praat.call(
        snd, "Change gender", 75, 600, formant_ratio,
        new_median, pitch_range, 1.0)
    return out.values[0].astype(np.float32)


def formant_shift_native(x: np.ndarray, sr: int,
                         ratio: float) -> np.ndarray:
    """Spectral-envelope warp: |S| is split into envelope (cepstral
    lowpass) x excitation; the envelope is resampled along frequency by
    ``ratio`` and recombined with the original phase."""
    n_fft = 1024
    f, t, S = sp_stft(x, fs=sr, nperseg=n_fft, noverlap=3 * n_fft // 4)
    mag = np.abs(S) + 1e-8
    phase = S / mag
    logm = np.log(mag)
    cep = np.fft.irfft(logm, axis=0)
    lift = 30
    cep_env = cep.copy()
    cep_env[lift:-lift] = 0.0
    env = np.fft.rfft(cep_env, axis=0).real
    exc = logm - env
    nf = env.shape[0]
    src = np.clip(np.arange(nf) / ratio, 0, nf - 1)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, nf - 1)
    w = (src - i0)[:, None]
    env_w = env[i0] * (1 - w) + env[i1] * w
    S2 = np.exp(env_w + exc) * phase
    _, y = sp_istft(S2, fs=sr, nperseg=n_fft, noverlap=3 * n_fft // 4)
    y = y[: len(x)]
    if len(y) < len(x):
        y = np.pad(y, (0, len(x) - len(y)))
    return y.astype(np.float32)


def random_formant_pitch(x: np.ndarray, rng: np.random.Generator,
                         sr: int = 44100) -> np.ndarray:
    """Random formant/pitch perturbation (reference
    ``perturbation.py:97-170``: formant ratio ~ U[1,1.4]^(+-1), pitch
    ratio ~ U[1,2]^(+-1), pitch range ratio ~ U[1,1.5]^(+-1))."""
    fr = rng.uniform(1.0, 1.4) ** (1 if rng.uniform() < 0.5 else -1)
    if HAVE_PRAAT:
        pr = rng.uniform(1.0, 2.0) ** (1 if rng.uniform() < 0.5 else -1)
        rr = rng.uniform(1.0, 1.5) ** (1 if rng.uniform() < 0.5 else -1)
        try:
            return _praat_change_gender(x, sr, fr, pr, rr)
        except Exception:
            pass
    return formant_shift_native(x, sr, fr)


class Perturb:
    """Composed perturbation pipeline (reference ``perturb``,
    ``perturbation.py:312-321``: formant/pitch shift then parametric EQ)."""

    def __init__(self, sr: int = 44100, p_formant: float = 1.0,
                 p_eq: float = 1.0):
        self.sr = sr
        self.p_formant = p_formant
        self.p_eq = p_eq

    def __call__(self, x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.uniform() < self.p_formant:
            x = random_formant_pitch(x, rng, self.sr)
        if rng.uniform() < self.p_eq:
            x = random_eq(x, rng, self.sr)
        peak = np.max(np.abs(x)) + 1e-9
        if peak > 1.0:
            x = x / peak
        return x.astype(np.float32)
