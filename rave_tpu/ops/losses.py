"""Audio distances and GAN losses.

Counterparts of reference ``rave/core.py:146-187,237-353`` and
``rave/stft_loss.py`` (the fork's active generator reconstruction loss).
All pure functions over arrays; accumulation stays in float32.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from .stft import multiscale_stft, stft


def mod_sigmoid(x: jax.Array) -> jax.Array:
    """Reference ``rave/core.py:66-67``."""
    return 2 * jax.nn.sigmoid(x) ** 2.3 + 1e-7


def mean_difference(target: jax.Array, value: jax.Array, norm: str = "L1",
                    relative: bool = False) -> jax.Array:
    """Reference ``rave/core.py:245-261``.

    Elementwise math stays in the input dtype (bf16 reads half the HBM
    bytes of f32 -- these reductions stream every discriminator feature
    map); accumulation is forced to f32 via ``jnp.mean(dtype=...)``.

    Accepts ``PackedFeature``-like inputs (``.data`` + ``.valid_frac()``,
    models/discriminators.py): padding rows are exact zeros on both
    sides, so the mean only needs a static denominator correction (which
    cancels in ``relative`` mode)."""
    corr = 1.0
    if hasattr(target, "valid_frac"):
        corr = 1.0 / target.valid_frac()
        target, value = target.data, value.data
    diff = target - value
    if norm == "L1":
        d = jnp.mean(jnp.abs(diff), dtype=jnp.float32)
        if relative:
            return d / jnp.mean(jnp.abs(target), dtype=jnp.float32)
        return d * corr
    if norm == "L2":
        d = jnp.mean(diff * diff, dtype=jnp.float32)
        if relative:
            return d / jnp.mean(target * target, dtype=jnp.float32)
        return d * corr
    raise ValueError(f"norm must be L1 or L2, got {norm}")


def audio_distance_v1(x: jax.Array, y: jax.Array,
                      scales: Sequence[int] = (2048, 1024, 512, 256, 128),
                      log_epsilon: float = 1e-7,
                      sample_rate: int = 44100,
                      num_mels: Optional[int] = None) -> jax.Array:
    """Reference ``AudioDistanceV1`` (``rave/core.py:331-353``): per scale,
    relative-L2 linear distance + L1 log distance."""
    sx = multiscale_stft(x, scales, sample_rate=sample_rate, num_mels=num_mels)
    sy = multiscale_stft(y, scales, sample_rate=sample_rate, num_mels=num_mels)
    total = jnp.float32(0.0)
    for a, b in zip(sx, sy):
        lin = mean_difference(a, b, "L2", relative=True)
        log = mean_difference(jnp.log(a + log_epsilon),
                              jnp.log(b + log_epsilon), "L1")
        total = total + lin + log
    return total


def mr_stft_resolutions(sample_rate: int = 44100,
                        specs_ms: Sequence[tuple] = ((5, 25), (10, 50), (2, 10))
                        ) -> list[tuple[int, int, int]]:
    """(n_fft, hop, win) triples from (hop_ms, win_ms) pairs -- reference
    ``rave/model.py:191-196``."""
    out = []
    for hop_ms, win_ms in specs_ms:
        hop = int(0.001 * hop_ms * sample_rate)
        win = int(0.001 * win_ms * sample_rate)
        n_fft = int(math.pow(2, int(math.log2(win)) + 1))
        out.append((n_fft, hop, win))
    return out


def _stft_mag(x: jax.Array, n_fft: int, hop: int, win: int) -> jax.Array:
    s = stft(x, n_fft, hop, win_length=win)
    return jnp.sqrt(jnp.clip(jnp.abs(s) ** 2, 1e-7))


def multi_resolution_stft_loss(x: jax.Array, y: jax.Array,
                               resolutions: Sequence[tuple[int, int, int]]
                               ) -> tuple[jax.Array, jax.Array]:
    """Spectral convergence + log-magnitude L1 over resolutions
    (reference ``rave/stft_loss.py:38-144``).  x, y: (B, T)."""
    sc = jnp.float32(0.0)
    mag = jnp.float32(0.0)
    for n_fft, hop, win in resolutions:
        xm = _stft_mag(x, n_fft, hop, win)
        ym = _stft_mag(y, n_fft, hop, win)
        sc = sc + jnp.linalg.norm(ym - xm) / jnp.linalg.norm(ym)
        mag = mag + jnp.mean(jnp.abs(jnp.log(ym) - jnp.log(xm)))
    n = len(resolutions)
    return sc / n, mag / n


def spectral_distance(x: jax.Array, y: jax.Array, n_fft: int,
                      sample_rate: int = 44100,
                      norms: Sequence[str] = ("L1",),
                      power: Optional[float] = 1.0,
                      mel: Optional[int] = None) -> jax.Array:
    """Single-scale (mel-)spectrogram distance (reference
    ``SpectralDistance``, ``rave/core.py:456-499``; hop = n_fft/4,
    uncentered like torchaudio's ``center=False``)."""
    from .stft import mel_filterbank, stft

    def spec(a):
        s = jnp.abs(stft(a, n_fft, n_fft // 4, center=False))
        if mel:
            fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, mel))
            s = s @ fb.T
        if power is not None and power != 1.0:
            s = s ** power
        return s

    sx, sy = spec(x), spec(y)
    total = jnp.float32(0.0)
    for norm in norms:
        total = total + mean_difference(sy, sx, norm)
    return total


def encodec_audio_distance(x: jax.Array, y: jax.Array,
                           scales: Sequence[int] = (32, 64, 128, 256, 512,
                                                    1024, 2048),
                           sample_rate: int = 44100,
                           mel: Optional[int] = None
                           ) -> dict[str, jax.Array]:
    """Encodec-style L1 waveform distance + summed multi-scale spectral
    distances (reference ``EncodecAudioDistance`` + ``WaveformDistance``,
    ``rave/core.py:424-453``)."""
    if x.ndim == 3:
        x = x[..., 0]
    if y.ndim == 3:
        y = y[..., 0]
    wav = mean_difference(y, x, "L1")
    spec = jnp.float32(0.0)
    for s in scales:
        spec = spec + spectral_distance(x, y, s, sample_rate,
                                        norms=("L1", "L2"), mel=mel)
    return {"waveform_distance": wav, "spectral_distance": spec}


def _instantaneous_frequency(phase: jax.Array) -> jax.Array:
    """Unwrapped phase derivative along the frequency axis (reference
    ``WeightedInstantaneousSpectralDistance``, ``rave/core.py:356-421``;
    the reference differentiates the last axis of its (freq-last) STFT)."""
    d = phase[..., 1:] - phase[..., :-1]
    d = (d + jnp.pi) % (2 * jnp.pi) - jnp.pi
    unwrapped = jnp.cumsum(d, axis=-1)
    return unwrapped[..., 1:] - unwrapped[..., :-1]


def weighted_instantaneous_spectral_distance(
        x: jax.Array, y: jax.Array,
        scales: Sequence[int] = (2048, 1024, 512, 256, 128),
        weighted: bool = False) -> dict[str, jax.Array]:
    """Complex multi-scale STFT distance with log1p amplitudes plus an
    instantaneous-frequency phase term (reference ``rave/core.py:356-421``).
    x, y: (B, T) or (B, T, 1)."""
    from .stft import multiscale_stft
    sx = multiscale_stft(x, scales, magnitude=False)
    sy = multiscale_stft(y, scales, magnitude=False)
    spec = jnp.float32(0.0)
    phase = jnp.float32(0.0)
    for a, b in zip(sx, sy):
        aa, ba = jnp.abs(a), jnp.abs(b)
        lin = mean_difference(aa, ba, "L2", relative=True)
        log = mean_difference(jnp.log1p(aa), jnp.log1p(ba), "L1")
        spec = spec + lin + log
        ia = _instantaneous_frequency(jnp.angle(a))
        ib = _instantaneous_frequency(jnp.angle(b))
        if weighted:
            mask = jnp.clip(jnp.log1p(aa[..., 2:]), 0.0, 1.0)
            ia = ia * mask
            ib = ib * mask
        phase = phase + mean_difference(ia, ib, "L2")
    return {"spectral_distance": spec, "phase_distance": phase}


# ---------------- GAN objectives (reference rave/core.py:168-187) --------

def hinge_gan(score_real, score_fake):
    loss_dis = jnp.mean(jax.nn.relu(1 - score_real) + jax.nn.relu(1 + score_fake))
    loss_gen = -jnp.mean(score_fake)
    return loss_dis, loss_gen


def ls_gan(score_real, score_fake):
    loss_dis = jnp.mean((score_real - 1) ** 2 + score_fake ** 2)
    loss_gen = jnp.mean((score_fake - 1) ** 2)
    return loss_dis, loss_gen


def nonsaturating_gan(score_real, score_fake):
    sr = jnp.clip(jax.nn.sigmoid(score_real), 1e-7, 1 - 1e-7)
    sf = jnp.clip(jax.nn.sigmoid(score_fake), 1e-7, 1 - 1e-7)
    loss_dis = -jnp.mean(jnp.log(sr) + jnp.log(1 - sf))
    loss_gen = -jnp.mean(jnp.log(sf))
    return loss_dis, loss_gen


GAN_LOSSES: dict[str, Callable] = {
    "hinge": hinge_gan,
    "ls": ls_gan,
    "nonsaturating": nonsaturating_gan,
}


# ------------- noise synthesis helpers (reference rave/core.py:95-129) ---

def amp_to_impulse_response(amp: jax.Array, target_size: int) -> jax.Array:
    """Frequency amplitudes -> windowed IR on the last dim."""
    ir = jnp.fft.irfft(amp.astype(jnp.complex64), axis=-1)
    filter_size = ir.shape[-1]
    ir = jnp.roll(ir, filter_size // 2, axis=-1)
    win = jnp.asarray(
        0.5 * (1 - jnp.cos(2 * jnp.pi * jnp.arange(filter_size) /
                           (filter_size - 1))), ir.dtype)  # symmetric hann
    ir = ir * win
    ir = jnp.pad(ir, [(0, 0)] * (ir.ndim - 1) + [(0, int(target_size) - filter_size)])
    return jnp.roll(ir, -filter_size // 2, axis=-1)


def fft_convolve(signal: jax.Array, kernel: jax.Array) -> jax.Array:
    """Circular-safe FFT convolution on the last dim (reference
    ``rave/core.py:119-129``)."""
    T = signal.shape[-1]
    signal = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(0, T)])
    kernel = jnp.pad(kernel, [(0, 0)] * (kernel.ndim - 1) + [(kernel.shape[-1], 0)])
    out = jnp.fft.irfft(jnp.fft.rfft(signal) * jnp.fft.rfft(kernel))
    return out[..., out.shape[-1] // 2:]


# ---------------- schedules (reference rave/core.py:146-161) -------------

def get_beta_kl(step, warmup, min_beta, max_beta):
    t = jnp.clip(step / warmup, 0.0, 1.0)
    beta_log = t * (jnp.log(max_beta) - jnp.log(min_beta)) + jnp.log(min_beta)
    return jnp.where(step > warmup, max_beta, jnp.exp(beta_log))


def get_beta_kl_cyclic(step, cycle_size, min_beta, max_beta):
    return get_beta_kl(step % cycle_size, cycle_size // 2, min_beta, max_beta)


def get_beta_kl_cyclic_annealed(step, cycle_size, warmup, min_beta, max_beta):
    min_beta = get_beta_kl(step, warmup, min_beta, max_beta)
    return get_beta_kl_cyclic(step, cycle_size, min_beta, max_beta)
