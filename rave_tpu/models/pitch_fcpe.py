"""FCPE neural pitch estimator (CFNaiveMelPE) in JAX.

The reference conditions its voice-conversion decoder on f0 extracted by
the ``torchfcpe`` neural pitch model (``rave/pitch_utils.py:10-12,133-143``
-- ``pitch_model.infer(..., decoder_mode='local_argmax', threshold=0.006)``)
and computes the per-speaker stats JSON with it
(``rave/pitch_utils.py:180-258``).  This module re-implements the
published torchfcpe architecture (CFNaiveMelPE: log-mel frontend ->
conv input stack -> conv-only conformer-naive encoder -> 360-bin cent
classification with sigmoid confidences, decoded by local-argmax over
cents with unvoiced thresholding) as pure JAX functions over a plain
params dict, plus a strict torch->flax checkpoint converter
(:func:`convert_fcpe_checkpoint`) following the
``models/speaker_convert.py`` pattern.

The model is inference-only and frozen; parameters ride along as data
(e.g. in ``model_state['fcpe']``) so the estimator jits into the training
or serving graph with no torch dependency at runtime.  Without a
checkpoint the framework falls back to the in-graph YIN
(:mod:`rave_tpu.ops.pitch`).

Architecture constants follow the published fcpe_c_v001 checkpoint:
16 kHz / 128 mels / n_fft 1024 / hop 160; hidden 512, 6 conv-only
conformer layers (pointwise 512->2048 GLU, depthwise k=31, swish,
pointwise 1024->512), LayerNorm + weight-normed Linear to 360 cent bins
spanning f0 32.70..1975.5 Hz (cent = 1200*log2(f0/10)).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.stft import mel_filterbank

# fcpe_c_v001 model constants
SR = 16000
N_MELS = 128
N_FFT = 1024
WIN = 1024
HOP = 160
F0_MIN = 32.70
F0_MAX = 1975.5
OUT_DIMS = 360
HIDDEN = 512
N_LAYERS = 6
KERNEL = 31
EXPANSION = 2


def f0_to_cent(f0):
    return 1200.0 * np.log2(f0 / 10.0)


def cent_to_f0(cent: jax.Array) -> jax.Array:
    return 10.0 * 2.0 ** (cent / 1200.0)


def cent_table() -> np.ndarray:
    return np.linspace(f0_to_cent(F0_MIN), f0_to_cent(F0_MAX),
                       OUT_DIMS).astype(np.float32)


# ----------------------------------------------------------------------
# parameter initialisation (random init for tests; real use converts a
# torchfcpe checkpoint)
# ----------------------------------------------------------------------

def init_fcpe_params(rng: jax.Array) -> dict:
    """Random-init params with the exact tree layout the converter
    produces.  All convs are stored as (width, in, out) kernels
    ((in, out) for pointwise) matching ops.conv's (B, T, C) layout."""
    ks = jax.random.split(rng, 4 + 4 * N_LAYERS)

    def dense(r, i, o):
        s = 1.0 / np.sqrt(i)
        return jax.random.uniform(r, (i, o), jnp.float32, -s, s)

    def conv(r, w, i, o):
        s = 1.0 / np.sqrt(i * w)
        return jax.random.uniform(r, (w, i, o), jnp.float32, -s, s)

    p = {
        "in0": {"kernel": conv(ks[0], 3, N_MELS, HIDDEN),
                "bias": jnp.zeros((HIDDEN,))},
        "in_gn": {"scale": jnp.ones((HIDDEN,)),
                  "bias": jnp.zeros((HIDDEN,))},
        "in1": {"kernel": conv(ks[1], 3, HIDDEN, HIDDEN),
                "bias": jnp.zeros((HIDDEN,))},
        "norm": {"scale": jnp.ones((HIDDEN,)),
                 "bias": jnp.zeros((HIDDEN,))},
        "out": {"kernel": dense(ks[2], HIDDEN, OUT_DIMS),
                "bias": jnp.zeros((OUT_DIMS,))},
        "layers": [],
    }
    inner = HIDDEN * EXPANSION
    for li in range(N_LAYERS):
        r = jax.random.split(ks[4 + li], 3)
        p["layers"].append({
            "ln": {"scale": jnp.ones((HIDDEN,)),
                   "bias": jnp.zeros((HIDDEN,))},
            "pw1": {"kernel": dense(r[0], HIDDEN, inner * 2),
                    "bias": jnp.zeros((inner * 2,))},
            "dw": {"kernel": conv(r[1], KERNEL, 1, inner),  # depthwise
                   "bias": jnp.zeros((inner,))},
            "pw2": {"kernel": dense(r[2], inner, HIDDEN),
                    "bias": jnp.zeros((HIDDEN,))},
        })
    return p


# ----------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------

def _conv1d_same(x, kernel, bias):
    """(B, T, Cin) x (W, Cin, Cout) -> (B, T, Cout), SAME padding."""
    y = jax.lax.conv_general_dilated(
        x, kernel, (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y + bias


def _depthwise_same(x, kernel, bias):
    """(B, T, C) x (W, 1, C) -> (B, T, C) depthwise, SAME padding."""
    y = jax.lax.conv_general_dilated(
        x, kernel, (1,), "SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1])
    return y + bias


def _layer_norm(x, p):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + 1e-5) * p["scale"] + p["bias"]


def _group_norm(x, p, groups: int = 4):
    B, T, C = x.shape
    g = x.reshape(B, T, groups, C // groups)
    # torch GroupNorm normalises over (channel-group, spatial) jointly
    m = g.mean((1, 3), keepdims=True)
    v = ((g - m) ** 2).mean((1, 3), keepdims=True)
    g = (g - m) / jnp.sqrt(v + 1e-5)
    return g.reshape(B, T, C) * p["scale"] + p["bias"]


def fcpe_latent(params: dict, mel: jax.Array) -> jax.Array:
    """(B, frames, n_mels) log-mel -> (B, frames, OUT_DIMS) sigmoid
    confidences (torchfcpe CFNaiveMelPE.forward)."""
    x = _conv1d_same(mel, params["in0"]["kernel"], params["in0"]["bias"])
    x = _group_norm(x, params["in_gn"])
    x = jax.nn.leaky_relu(x, 0.01)
    x = _conv1d_same(x, params["in1"]["kernel"], params["in1"]["bias"])
    for lp in params["layers"]:
        # conv-only conformer block: x + ConformerConvModule(x)
        h = _layer_norm(x, lp["ln"])
        h = h @ lp["pw1"]["kernel"] + lp["pw1"]["bias"]
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)                    # GLU
        h = _depthwise_same(h, lp["dw"]["kernel"], lp["dw"]["bias"])
        h = h * jax.nn.sigmoid(h)                    # swish
        h = h @ lp["pw2"]["kernel"] + lp["pw2"]["bias"]
        x = x + h
    x = _layer_norm(x, params["norm"])
    x = x @ params["out"]["kernel"] + params["out"]["bias"]
    return jax.nn.sigmoid(x)


def decode_local_argmax(latent: jax.Array, threshold: float = 0.006,
                        window: int = 9) -> jax.Array:
    """Sigmoid confidences -> f0 Hz, 0 where unvoiced (torchfcpe
    ``latent2cents_local_decoder`` + ``cent_to_f0``): cents = confidence-
    weighted average of the ``window`` bins around the argmax; frames
    whose peak confidence <= threshold are unvoiced."""
    ct = jnp.asarray(cent_table())
    conf = latent.max(-1)
    idx = latent.argmax(-1)
    offs = jnp.arange(window) - window // 2
    gather = jnp.clip(idx[..., None] + offs, 0, OUT_DIMS - 1)
    y_l = jnp.take_along_axis(latent, gather, axis=-1)
    ci_l = ct[gather]
    cents = (ci_l * y_l).sum(-1) / jnp.maximum(y_l.sum(-1), 1e-12)
    f0 = cent_to_f0(cents)
    return jnp.where(conf > threshold, f0, 0.0)


# ----------------------------------------------------------------------
# mel frontend + resampling
# ----------------------------------------------------------------------

def _resample_kernel(up: int, down: int, taps_per_phase: int = 32,
                     beta: float = 8.0) -> np.ndarray:
    """Kaiser-windowed sinc for polyphase ``up/down`` resampling (the
    scipy ``resample_poly`` recipe; static, designed at trace time)."""
    m = max(up, down)
    half = taps_per_phase * m
    n = np.arange(-half, half + 1)
    cutoff = 1.0 / m
    h = cutoff * np.sinc(cutoff * n) * np.kaiser(len(n), beta) * up
    return h.astype(np.float32)


@partial(jax.jit, static_argnums=(1, 2))
def resample_to(x: jax.Array, sr: int, target: int) -> jax.Array:
    """(B, T) -> (B, T * target // sr) polyphase resample (XLA conv with
    lhs dilation; one fused op on TPU)."""
    if sr == target:
        return x
    from math import gcd
    g = gcd(sr, target)
    up, down = target // g, sr // g
    h = jnp.asarray(_resample_kernel(up, down))
    pad = (len(h) - 1) // 2
    y = jax.lax.conv_general_dilated(
        x[:, :, None], h[:, None, None], (down,),
        [(pad, pad)], lhs_dilation=(up,),
        dimension_numbers=("NWC", "WIO", "NWC"))[:, :, 0]
    want = x.shape[1] * up // down
    return y[:, :want]


def log_mel(x16: jax.Array) -> jax.Array:
    """16 kHz audio (B, T) -> (B, frames, 128) log-mel (torchfcpe
    Wav2Mel: hann window, reflect-padded stft, slaney mel filterbank,
    log(clamp(mel, 1e-5)))."""
    from ..ops.stft import hann_window
    pad = (N_FFT - HOP) // 2
    xp = jnp.pad(x16, ((0, 0), (pad, pad)), mode="reflect")
    n = 1 + (xp.shape[1] - N_FFT) // HOP
    idx = jnp.arange(N_FFT)[None, :] + HOP * jnp.arange(n)[:, None]
    # torch.hann_window default = PERIODIC hann (jnp.hanning is the
    # symmetric variant, a small systematic mel mismatch vs torchfcpe)
    frames = xp[:, idx] * jnp.asarray(hann_window(WIN))
    mag = jnp.abs(jnp.fft.rfft(frames, axis=-1))
    fb = jnp.asarray(mel_filterbank(SR, N_FFT, N_MELS, fmax=SR // 2))
    mel = jnp.einsum("bnf,mf->bnm", mag, fb)
    return jnp.log(jnp.clip(mel, 1e-5))


def fcpe_f0(params: dict, x: jax.Array, sr: int,
            out_frames: Optional[int] = None,
            threshold: float = 0.006,
            fmin: float = 50.0, fmax: float = 550.0) -> jax.Array:
    """Audio (B, T) at ``sr`` -> (B, out_frames) f0 Hz (0 = unvoiced).

    The full torchfcpe ``infer`` composition the reference calls
    (``pitch_utils.py:133-143``): resample to 16 kHz, log-mel, net,
    local-argmax decode, the ``f0_min``/``f0_max`` post-processing
    (detections below ``fmin`` are treated unvoiced and zeroed,
    detections above ``fmax`` clamped -- the reference passes 50/550),
    then linear interpolation to ``out_frames`` (the reference passes
    ``output_interp_target_length = T // frame_len``)."""
    x16 = resample_to(x.astype(jnp.float32), sr, SR)
    lat = fcpe_latent(params, log_mel(x16))
    f0 = decode_local_argmax(lat, threshold)
    f0 = jnp.where(f0 < fmin, 0.0, jnp.minimum(f0, fmax))
    if out_frames is not None and f0.shape[1] != out_frames:
        f0 = jax.image.resize(f0, (f0.shape[0], out_frames), "linear")
    return f0


# ----------------------------------------------------------------------
# torch -> JAX checkpoint conversion
# ----------------------------------------------------------------------

def convert_fcpe_checkpoint(path: str) -> dict:
    """Convert a torchfcpe checkpoint (``fcpe_c_v001.pt``-style: a dict
    with a ``model`` state_dict, possibly nested under other keys) into
    the :func:`fcpe_latent` params tree.  Strict: every expected key must
    exist with the exact transposed shape (layout mistakes are rejected,
    never reshaped -- see models/speaker_convert.py ADVICE fix)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("model", raw) if isinstance(raw, dict) else raw
    if not isinstance(sd, dict):
        sd = sd.state_dict()
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()
          if hasattr(v, "shape")}
    # strip any wrapper prefix (e.g. 'model.')
    if not any(k.startswith("input_stack") for k in sd):
        pref = next((k.split("input_stack")[0] for k in sd
                     if "input_stack" in k), None)
        if pref is None:
            raise ValueError(
                f"{path}: no input_stack.* keys; not a CFNaiveMelPE "
                f"state dict (keys: {sorted(sd)[:8]}...)")
        sd = {k[len(pref):]: v for k, v in sd.items() if k.startswith(pref)}

    def take(key, want_shape, transpose=None):
        if key not in sd:
            raise KeyError(f"{path}: missing {key}")
        w = sd.pop(key)
        if transpose is not None:
            w = w.transpose(transpose)
        if tuple(w.shape) != tuple(want_shape):
            raise ValueError(f"{path}: {key} shape {w.shape} != expected "
                             f"{want_shape} (refusing to reshape)")
        return jnp.asarray(w)

    def wn_linear(prefix, i, o):
        """weight_norm'd Linear: weight = g * v / ||v|| (rowwise)."""
        if f"{prefix}.weight" in sd:
            w = sd.pop(f"{prefix}.weight").astype(np.float32)
        else:
            v = sd.pop(f"{prefix}.weight_v").astype(np.float32)
            g = sd.pop(f"{prefix}.weight_g").astype(np.float32)
            w = g * v / np.linalg.norm(v, axis=1, keepdims=True)
        if w.shape != (o, i):
            raise ValueError(f"{prefix}: {w.shape} != {(o, i)}")
        return jnp.asarray(w.T)

    inner = HIDDEN * EXPANSION
    p = {
        # torch Conv1d weight (out, in, W) -> (W, in, out)
        "in0": {"kernel": take("input_stack.0.weight",
                               (3, N_MELS, HIDDEN), (2, 1, 0)),
                "bias": take("input_stack.0.bias", (HIDDEN,))},
        "in_gn": {"scale": take("input_stack.1.weight", (HIDDEN,)),
                  "bias": take("input_stack.1.bias", (HIDDEN,))},
        "in1": {"kernel": take("input_stack.3.weight",
                               (3, HIDDEN, HIDDEN), (2, 1, 0)),
                "bias": take("input_stack.3.bias", (HIDDEN,))},
        "norm": {"scale": take("norm.weight", (HIDDEN,)),
                 "bias": take("norm.bias", (HIDDEN,))},
        "out": {"kernel": wn_linear("output_proj", HIDDEN, OUT_DIMS),
                "bias": take("output_proj.bias", (OUT_DIMS,))},
        "layers": [],
    }
    for li in range(N_LAYERS):
        base = f"net.encoder_layers.{li}.conformer.net"
        p["layers"].append({
            "ln": {"scale": take(f"{base}.0.weight", (HIDDEN,)),
                   "bias": take(f"{base}.0.bias", (HIDDEN,))},
            # pointwise Conv1d (out, in, 1) -> dense (in, out)
            "pw1": {"kernel": take(f"{base}.2.weight",
                                   (1, HIDDEN, inner * 2),
                                   (2, 1, 0))[0],
                    "bias": take(f"{base}.2.bias", (inner * 2,))},
            # depthwise Conv1d (C, 1, W) -> (W, 1, C)
            "dw": {"kernel": take(f"{base}.4.conv.weight",
                                  (KERNEL, 1, inner), (2, 1, 0)),
                   "bias": take(f"{base}.4.conv.bias", (inner,))},
            "pw2": {"kernel": take(f"{base}.6.weight",
                                   (1, inner, HIDDEN), (2, 1, 0))[0],
                    "bias": take(f"{base}.6.bias", (HIDDEN,))},
        })
    # strictness also means NOTHING was silently discarded: a checkpoint
    # trained with conv_only=False carries self-attention weights in
    # every encoder layer, and dropping them would yield a wrong-but-
    # plausible pitch model.  The only tolerated leftovers are the
    # per-layer ``net.encoder_layers.*.norm.*`` LayerNorms (present in
    # the torchfcpe module but unused by its conv-only forward).
    leftover = [k for k in sd
                if not (k.startswith("net.encoder_layers.")
                        and ".norm." in k)]
    if leftover:
        raise ValueError(
            f"{path}: {len(leftover)} unconsumed weight keys (e.g. "
            f"{sorted(leftover)[:5]}); the checkpoint does not match the "
            "conv-only CFNaiveMelPE layout this converter supports "
            "(was it trained with conv_only=False / self-attention?)")
    return p


_PARAM_CACHE: dict = {}


def get_fcpe_params(path: str) -> Optional[dict]:
    """Load-and-convert a torchfcpe checkpoint once per process; the
    params tree becomes trace-time constants of whatever graph calls
    :func:`fcpe_f0` (frozen teacher -- never trained, never saved).
    Returns None (with a one-time warning) when the path is empty or
    missing, signalling the YIN fallback."""
    if not path:
        return None
    if path not in _PARAM_CACHE:
        import os
        import warnings
        if not os.path.exists(path):
            warnings.warn(f"pitch_ckpt {path!r} not found: falling back "
                          "to the in-graph YIN estimator", stacklevel=2)
            _PARAM_CACHE[path] = None
        else:
            _PARAM_CACHE[path] = convert_fcpe_checkpoint(path)
    return _PARAM_CACHE[path]
