"""STFT, mel filterbanks and multiscale spectral transforms (XLA FFT).

TPU-native counterpart of the reference's torch/cuFFT spectral stack
(``rave/core.py:278-328`` ``MultiScaleSTFT``/``MelScale``,
``rave/stft_loss.py:12-35`` ``stft``).  Framing uses
``conv_general_dilated_patches`` so XLA lowers it to strided copies, and
the FFTs batch over (B*frames) which keeps the TPU FFT unit busy.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann, matching ``torch.hann_window`` defaults."""
    n = np.arange(win_length)
    return (0.5 * (1 - np.cos(2 * np.pi * n / win_length))).astype(np.float32)


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(..., T) -> (..., n_frames, frame_length).

    When ``hop`` divides ``frame_length`` the frames are assembled from
    ``frame_length // hop`` shifted views of a ``(T//hop, hop)`` block
    reshape.  This matters for the backward pass: the VJP of slices is
    padding (dense, ~ms), whereas the VJP of
    ``conv_general_dilated_patches`` lowers to a scatter-add that costs
    ~650 ms per STFT scale on TPU -- it dominated the whole train step.
    """
    *lead, T = x.shape
    g = int(np.gcd(frame_length, hop))
    if frame_length // g <= 32 and T >= frame_length:
        r = frame_length // g          # blocks per frame
        hopg = hop // g                # block stride between frames
        n_frames = (T - frame_length) // hop + 1
        blocks = x[..., :(T // g) * g].reshape(*lead, T // g, g)
        ax = len(lead)
        return jnp.concatenate(
            [jax.lax.slice_in_dim(blocks, j, j + (n_frames - 1) * hopg + 1,
                                  stride=hopg, axis=ax)
             for j in range(r)], axis=-1)
    x2 = x.reshape(-1, T, 1)
    patches = jax.lax.conv_general_dilated_patches(
        x2, filter_shape=(frame_length,), window_strides=(hop,),
        padding=[(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"))
    n_frames = patches.shape[1]
    return patches.reshape(*lead, n_frames, frame_length)


def stft(x: jax.Array,
         n_fft: int,
         hop_length: int,
         win_length: Optional[int] = None,
         center: bool = True,
         pad_mode: str = "reflect",
         normalized: bool = False) -> jax.Array:
    """Complex STFT, torch.stft-compatible conventions.

    x: (..., T) -> (..., n_frames, n_fft // 2 + 1) complex64.
    (Note: torch returns (freq, frames); we keep time-major for TPU
    layout friendliness -- frames in sublanes, bins in lanes.)
    """
    win_length = win_length or n_fft
    win = hann_window(win_length)
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        win = np.pad(win, (lp, n_fft - win_length - lp))
    window = jnp.asarray(win, x.dtype)

    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)

    frames = frame_signal(x, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    if normalized:
        spec = spec / jnp.sqrt(jnp.sum(window.astype(jnp.float32) ** 2))
    return spec


def spectrogram(x: jax.Array, n_fft: int, hop_length: int,
                power: Optional[float] = 2.0, **kw) -> jax.Array:
    s = stft(x, n_fft, hop_length, **kw)
    if power is None:
        return s
    mag = jnp.abs(s)
    return mag if power == 1.0 else mag ** power


@lru_cache(maxsize=None)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-style mel filterbank, (n_mels, n_fft//2+1).

    Reimplements ``librosa.filters.mel`` defaults (slaney scale + slaney
    norm) used by the reference ``MelScale`` (``rave/core.py:264-275``).
    """
    fmax = fmax or sample_rate / 2

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3)
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                        mel)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3)
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)), f)

    fftfreqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    weights = np.maximum(
        0, np.minimum(-ramps[:-2] / fdiff[:-1, None], ramps[2:] / fdiff[1:, None]))
    enorm = 2.0 / (mel_pts[2:n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def multiscale_stft(x: jax.Array,
                    scales: Sequence[int],
                    magnitude: bool = True,
                    normalized: bool = False,
                    sample_rate: int = 44100,
                    num_mels: Optional[int] = None) -> list[jax.Array]:
    """Reference ``MultiScaleSTFT`` (``rave/core.py:278-328``):
    per-scale Spectrogram(n_fft=s, hop=s//4).  x: (B, T) or (B, T, C)."""
    if x.ndim == 3:
        x = x.transpose(0, 2, 1).reshape(-1, x.shape[1])  # (B*C, T)
    out = []
    for scale in scales:
        s = stft(x, scale, scale // 4, normalized=normalized)
        if num_mels is not None:
            mel = jnp.asarray(mel_filterbank(sample_rate, scale, num_mels))
            s = jnp.abs(s) @ mel.T  # (B, frames, mels)
            out.append(s)
            continue
        out.append(jnp.abs(s) if magnitude else s)
    return out
