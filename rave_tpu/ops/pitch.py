"""In-graph pitch (f0) estimation and conditioning features.

TPU-native YIN: FFT-autocorrelation cumulative-mean-normalised
difference, fully vectorised (no per-frame Python loops), so the whole
extractor jits into the forward graph.  Mirrors the reference's
torch-YIN (``rave/pitch_utils.py:16-96``) and the numpy oracle in
:mod:`rave_tpu.data.pitch`; the FCPE neural estimator the fork pins to
``cuda:2`` (``pitch_utils.py:12``) is replaced by this implementation.

The conditioning surface reproduces the fork's voice-conversion export
path (``scripts/export.py:349-359,397``): per-utterance log-f0
median/std normalisation concatenated to the decoder latent.  In the
fork that feature is commented out of the training step
(``rave/model.py:319-325``) while still referenced by ``myforward`` —
here it is a first-class config option (``pitch_embedding_size``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def yin_f0(x: jax.Array, sr: int, frame_length: int = 2048,
           hop: int = 1024, fmin: float = 50.0, fmax: float = 550.0,
           threshold: float = 0.1) -> jax.Array:
    """Batched YIN f0. ``x``: (B, T) audio -> (B, n_frames) f0 in Hz,
    0 where unvoiced.  Same math as ``data.pitch.yin_f0`` (the numpy
    oracle), with the descend-to-local-minimum search vectorised as
    "first index at-or-after the threshold crossing with non-decreasing
    cmdf slope" (equivalent to the torch ``_search``,
    ``pitch_utils.py:76-89``)."""
    B, T = x.shape
    if T < frame_length:  # pad to one frame (torch _frame does the same)
        x = jnp.pad(x, ((0, 0), (0, frame_length - T)))
        T = frame_length
    n = 1 + (T - frame_length) // hop
    idx = jnp.arange(frame_length)[None, :] + hop * jnp.arange(n)[:, None]
    frames = x.astype(jnp.float32)[:, idx]                 # (B, n, L)
    w = frame_length // 2

    # difference function d(tau) via FFT autocorrelation
    fft = jnp.fft.rfft(frames, 2 * frame_length, axis=-1)
    acf = jnp.fft.irfft(fft * jnp.conj(fft), axis=-1)[..., :w]
    # d(tau) = E[0..L-tau-1] + E[tau..L-1] - 2*corr(tau) (YIN eq. 6/7,
    # cf. torch `_diff`, pitch_utils.py:52-72)
    energy = jnp.cumsum(frames * frames, axis=-1)
    e0 = energy[..., -1:]
    e_tau = e0 - jnp.concatenate(
        [jnp.zeros((B, n, 1), frames.dtype), energy[..., :w - 1]], axis=-1)
    e_first = jnp.flip(energy, axis=-1)[..., :w]
    d = e_first + e_tau - 2 * acf

    # cumulative mean normalisation (YIN eq. 8)
    tau = jnp.arange(1, w, dtype=frames.dtype)
    cmdf = d[..., 1:] * tau / (jnp.cumsum(d[..., 1:], axis=-1) + 1e-9)
    cmdf = jnp.concatenate([jnp.ones((B, n, 1), frames.dtype), cmdf],
                           axis=-1)                        # (B, n, w)

    tau_min = int(sr / fmax)
    tau_max = min(int(sr / fmin), w - 1)
    search = cmdf[..., tau_min:tau_max]                    # (B, n, S)
    S = search.shape[-1]
    below = search < threshold
    first = jnp.where(below.any(-1), jnp.argmax(below, axis=-1),
                      jnp.argmin(search, axis=-1))         # (B, n)

    # descend to the local minimum: first j >= first with slope >= 0
    slope_up = jnp.concatenate(
        [jnp.diff(search, axis=-1) >= 0,
         jnp.ones((B, n, 1), bool)], axis=-1)              # (B, n, S)
    at_or_after = jnp.arange(S)[None, None, :] >= first[..., None]
    sel = jnp.argmax(at_or_after & slope_up, axis=-1)      # (B, n)

    val = jnp.take_along_axis(search, sel[..., None], axis=-1)[..., 0]
    voiced = val < threshold
    tau_est = sel + tau_min

    # parabolic interpolation around the minimum (on the full cmdf)
    t0 = jnp.clip(tau_est, 1, w - 2)
    ar = jnp.take_along_axis
    d0 = ar(cmdf, (t0 - 1)[..., None], axis=-1)[..., 0]
    d1 = ar(cmdf, t0[..., None], axis=-1)[..., 0]
    d2 = ar(cmdf, (t0 + 1)[..., None], axis=-1)[..., 0]
    denom = 2 * (d0 - 2 * d1 + d2)
    delta = jnp.where(jnp.abs(denom) > 1e-12,
                      (d0 - d2) / (denom + 1e-12), 0.0)
    tau_ref = t0 + jnp.clip(delta, -1, 1)

    return jnp.where(voiced, sr / jnp.maximum(tau_ref, 1e-6), 0.0)


def voiced_log_stats(f0: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-item (median, std) of log-f0 over voiced frames — the
    per-utterance normalisation statistics ``myforward`` extracts per
    block (reference ``extract_f0_median_std``, ``pitch_utils.py:146-151``
    via ``export.py:349-354``).  ``f0``: (B, n) -> ((B,), (B,)).

    All-unvoiced items get neutral stats; the normalised feature is zero
    on unvoiced frames regardless, so the values never leak."""
    voiced = f0 > 0
    cnt = voiced.sum(-1)
    lf0 = jnp.where(voiced, jnp.log(jnp.maximum(f0, 1e-6)), jnp.inf)
    srt = jnp.sort(lf0, axis=-1)
    mid = jnp.clip((cnt - 1) // 2, 0, f0.shape[-1] - 1)
    med = jnp.take_along_axis(srt, mid[:, None], axis=-1)[:, 0]
    med = jnp.where(cnt > 0, med, jnp.log(160.0))
    lf0v = jnp.where(voiced, jnp.log(jnp.maximum(f0, 1e-6)), 0.0)
    mean = jnp.where(cnt > 0, lf0v.sum(-1) / jnp.maximum(cnt, 1), med)
    var = jnp.where(voiced, (lf0v - mean[:, None]) ** 2, 0.0).sum(-1) \
        / jnp.maximum(cnt, 1)
    std = jnp.where(cnt > 1, jnp.sqrt(var), 1.0)
    return med, std


def f0_norm_feature(f0: jax.Array, median: jax.Array, std: jax.Array,
                    out_frames: int, channels: int = 1) -> jax.Array:
    """Normalised-f0 conditioning feature at the latent frame rate.

    ``f0``: (B, n); ``median``/``std``: (B,) log-f0 stats (speaker-level
    from ``rave-tpu speaker_stats``, or per-utterance via
    :func:`voiced_log_stats`).  Voiced frames are z-scored in log space
    (reference ``get_f0_norm`` whitening, ``pitch_utils.py:112-127`` /
    ``get_f0_norm_fcpe`` "whitening"), unvoiced are 0; linear-resampled
    to ``out_frames`` -> (B, out_frames, channels)."""
    voiced = f0 > 0
    lf0 = jnp.where(voiced, jnp.log(jnp.maximum(f0, 1e-6)), 0.0)
    feat = jnp.where(voiced,
                     (lf0 - median[:, None]) / (std[:, None] + 1e-6), 0.0)
    feat = jax.image.resize(feat, (f0.shape[0], out_frames), "linear")
    feat = feat.astype(jnp.float32)[..., None]
    if channels > 1:
        feat = jnp.tile(feat, (1, 1, channels))
    return feat


def pitch_feature(x: jax.Array, out_frames: int, sr: int,
                  hop: int = 1024, fmin: float = 50.0, fmax: float = 550.0,
                  median: jax.Array | None = None,
                  std: jax.Array | None = None,
                  channels: int = 1, estimator: str = "yin",
                  fcpe_ckpt: str = "") -> jax.Array:
    """Audio (B, T, 1) -> decoder pitch conditioning (B, out_frames, C).

    One call covering the fork's serving composition
    (``export.py:349-359``: extract f0, normalise by utterance stats,
    concat to the latent).  Pass ``median``/``std`` to use external
    (speaker-level) statistics instead of per-utterance ones.

    ``estimator="fcpe"`` + a ``fcpe_ckpt`` path uses the converted FCPE
    neural pitch model in-graph (the reference's operative estimator,
    ``pitch_utils.py:133-143``); missing checkpoint falls back to YIN
    with a one-time warning."""
    f0 = None
    if estimator == "fcpe":
        from ..models.pitch_fcpe import fcpe_f0, get_fcpe_params
        params = get_fcpe_params(fcpe_ckpt)
        if params is not None:
            n_frames = max(1, x.shape[1] // hop)
            f0 = fcpe_f0(params, x[..., 0], sr, out_frames=n_frames,
                         fmin=fmin, fmax=fmax)
    if f0 is None:
        f0 = yin_f0(x[..., 0], sr, hop=hop, fmin=fmin, fmax=fmax)
    if median is None or std is None:
        med_u, std_u = voiced_log_stats(f0)
        median = med_u if median is None else median
        std = std_u if std is None else std
    return f0_norm_feature(f0, median, std, out_frames, channels)
