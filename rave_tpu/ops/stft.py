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


def _frame_signal_impl(x: jax.Array, frame_length: int,
                       hop: int) -> jax.Array:
    """Universal cheap framing: view the signal as ``hop``-sized rows;
    frame ``k`` is rows ``k .. k+M-1`` concatenated (``M = ceil(L/hop)``,
    the overlap factor -- always small).  Every hop/L combination is M
    dense contiguous slices + one concat; the
    ``conv_general_dilated_patches`` alternative lowers to an
    identity-kernel L-tap convolution that costs 10-30 ms per MR-STFT
    scale on TPU (it WAS the fork loss's forward floor)."""
    *lead, T = x.shape
    L = frame_length
    n_frames = (T - L) // hop + 1
    if n_frames <= 0:
        raise ValueError(f"signal length {T} shorter than frame {L}")
    M = -(-L // hop)
    rows_needed = n_frames + M
    Tp = rows_needed * hop
    if Tp > T:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, Tp - T)])
    else:
        x = x[..., :Tp]
    rows = x.reshape(*lead, rows_needed, hop)
    ax = len(lead)
    out = jnp.concatenate(
        [jax.lax.slice_in_dim(rows, m, m + n_frames, axis=ax)
         for m in range(M)], axis=-1)
    return out[..., :L]


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(..., T) -> (..., n_frames, frame_length).

    The VJP is a hand-written dense overlap-add: the cotangent of sample
    ``t`` sums the frame taps that read it, which decomposes into
    ``ceil(frame_length / hop)`` shifted block adds -- a handful of
    pad+adds.  The automatic VJP of the general gather/patches framing
    lowers to a scatter-add that costs ~650 ms per STFT scale on TPU (it
    dominated the whole train step; the fork's MR-STFT hops 220/441/88
    all hit it, making the fork gradient 70x its forward).
    """
    return _frame_signal_impl(x, frame_length, hop)


def _frame_signal_fwd(x, frame_length, hop):
    return _frame_signal_impl(x, frame_length, hop), x.shape


def _frame_signal_bwd(frame_length, hop, res, gbar):
    xshape = res
    xdtype = gbar.dtype  # framing preserves dtype
    *lead, T = xshape
    n_frames = gbar.shape[-2]
    M = -(-frame_length // hop)        # overlapping frames per position
    Lp = M * hop
    g2 = gbar.reshape(-1, n_frames, gbar.shape[-1]).astype(jnp.float32)
    g2 = jnp.pad(g2, ((0, 0), (0, 0), (0, Lp - frame_length)))
    g2 = g2.reshape(-1, n_frames, M, hop)
    # frame k, sub-block m lands at block row k + m of a (rows, hop) grid
    out = jnp.zeros((g2.shape[0], n_frames + M, hop), jnp.float32)
    for m in range(M):
        out = jax.lax.dynamic_update_slice_in_dim(
            out,
            jax.lax.dynamic_slice_in_dim(out, m, n_frames, axis=1)
            + g2[:, :, m, :],
            m, axis=1)
    flat = out.reshape(g2.shape[0], (n_frames + M) * hop)
    if flat.shape[-1] < T:
        flat = jnp.pad(flat, ((0, 0), (0, T - flat.shape[-1])))
    xbar = flat[:, :T].reshape(*lead, T).astype(xdtype)
    return (xbar,)


frame_signal.defvjp(_frame_signal_fwd, _frame_signal_bwd)


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
                   fmin: float = 0.0, fmax: Optional[float] = None,
                   htk: bool = False,
                   norm: Optional[str] = "slaney") -> np.ndarray:
    """Mel filterbank, (n_mels, n_fft//2+1).

    Defaults reimplement ``librosa.filters.mel`` (slaney scale + slaney
    norm), used by the reference ``MelScale`` (``rave/core.py:264-275``).
    ``htk=True, norm=None`` gives the ``torchaudio.transforms
    .MelSpectrogram`` defaults the reference's hybrid front end uses
    (``configs/hybrid.gin`` sets neither, so torchaudio's htk/no-norm
    defaults apply).
    """
    fmax = fmax or sample_rate / 2

    if htk:
        def hz_to_mel(f):
            return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

        def mel_to_hz(m):
            return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)
    else:
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
    if norm == "slaney":
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
