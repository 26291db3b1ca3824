"""Torch-checkpoint -> flax converter for the pretrained speaker encoder.

The reference loads a VoxCeleb-pretrained ECAPA state dict whose keys are
prefixed ``__S__.`` and may bundle PQMF weights
(``rave/model.py:278-299``, ``rave/core.py:52-64``); the network itself
is ``SpeakerRAVE`` (``rave/blocks.py:1022-1147``).  This module maps that
torch state dict onto :class:`rave_tpu.models.speaker.SpeakerRAVE`'s
parameter tree:

* the ``__S__.`` prefix rewrite and ``pqmf.*`` split are reproduced,
* plain conv ``weight`` OR torch ``weight_norm`` pairs
  (``weight_g``/``weight_v``) are both accepted; our convs are always
  weight-normed (``v``/``g``), so plain weights become
  ``v=w, g=||w||`` (which resolves back to exactly ``w``),
* layouts: torch conv ``(out, in, k)`` -> flax ``(k, in, out)``; torch
  linear ``(out, in)`` -> flax ``(in, out)``; BatchNorm running stats go
  to the ``batch_stats`` collection.

Torch is only needed to *read* the checkpoint (CPU, one-shot); training
never imports it.
"""

from __future__ import annotations

from typing import Any

import numpy as np

# torch module path (reference SpeakerRAVE naming) -> our flax path, for
# the weight-normed convs (everything wrapped in `normalization`)
_WN_CONV_MAP = {
    "in_layer": ("Conv1d_0",),
    "cat_layer": ("cat_layer",),
    "out_layer": ("out_layer",),
}
for _l in ("layer2", "layer3", "layer4"):
    # Residual(DilatedUnit).aligned.branches.0 == the DilatedUnit; its
    # net = [act, conv k, act, conv 1] -> indices 1 and 3
    _WN_CONV_MAP[f"{_l}.0.aligned.branches.0.net.1"] = \
        (_l, "DilatedUnit_0", "Conv1d_0")
    _WN_CONV_MAP[f"{_l}.0.aligned.branches.0.net.3"] = \
        (_l, "DilatedUnit_0", "Conv1d_1")
    _WN_CONV_MAP[f"{_l}.2"] = (_l, "Conv1d_0")

# plain convs (the attention head is never wrapped in `normalization`,
# blocks.py:1102-1108)
_PLAIN_CONV_MAP = {
    "attention.0": ("attn1",),
    "attention.3": ("attn2",),
}

_BN_MAP = {
    "attention.2": ("attn_bn",),
    "bn5": ("bn5",),
}

_DENSE_MAP = {
    "fc6": ("fc6",),
}


def strip_speaker_statedict(sd: dict) -> tuple[dict, dict]:
    """The reference's ``__S__.`` rewrite + pqmf split
    (``rave/model.py:285-299``). Returns ``(speaker_sd, pqmf_sd)``."""
    speaker, pqmf = {}, {}
    for name, value in sd.items():
        new = name.replace("__S__.", "")
        if "pqmf" in new:
            pqmf[new.replace("pqmf.", "")] = value
        else:
            speaker[new] = value
    return speaker, pqmf


def _resolve_weight(sd: dict, prefix: str) -> np.ndarray:
    """Plain ``weight`` or weight-norm ``weight_g``/``weight_v``."""
    if f"{prefix}.weight" in sd:
        return np.asarray(sd[f"{prefix}.weight"], np.float32)
    g = np.asarray(sd[f"{prefix}.weight_g"], np.float32)
    v = np.asarray(sd[f"{prefix}.weight_v"], np.float32)
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True) + 1e-12)
    return g * v / norm


def _set(tree: dict, path: tuple, leaf: str, value: np.ndarray):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def convert_speaker_state(sd: dict) -> tuple[dict, dict]:
    """Map a (stripped) torch SpeakerRAVE state dict onto our flax tree.

    Returns ``(params, batch_stats)`` nested dicts matching
    ``SpeakerRAVE.init``'s structure exactly (missing keys raise).
    """
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    for tname, fpath in _WN_CONV_MAP.items():
        w = _resolve_weight(sd, tname)           # (out, in, k)
        v = np.transpose(w, (2, 1, 0))           # (k, in, out)
        g = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True) + 1e-12)
        if f"{tname}.weight_g" in sd:
            g = np.asarray(sd[f"{tname}.weight_g"], np.float32) \
                .reshape(1, 1, -1)
            v = np.transpose(
                np.asarray(sd[f"{tname}.weight_v"], np.float32), (2, 1, 0))
        _set(params, fpath[:-1], fpath[-1],
             {"v": v, "g": g,
              "bias": np.asarray(sd[f"{tname}.bias"], np.float32)})

    for tname, fpath in _PLAIN_CONV_MAP.items():
        w = _resolve_weight(sd, tname)
        _set(params, fpath[:-1], fpath[-1],
             {"kernel": np.transpose(w, (2, 1, 0)),
              "bias": np.asarray(sd[f"{tname}.bias"], np.float32)})

    for tname, fpath in _BN_MAP.items():
        _set(params, fpath[:-1], fpath[-1],
             {"scale": np.asarray(sd[f"{tname}.weight"], np.float32),
              "bias": np.asarray(sd[f"{tname}.bias"], np.float32)})
        _set(stats, fpath[:-1], fpath[-1],
             {"mean": np.asarray(sd[f"{tname}.running_mean"], np.float32),
              "var": np.asarray(sd[f"{tname}.running_var"], np.float32)})

    for tname, fpath in _DENSE_MAP.items():
        w = np.asarray(sd[f"{tname}.weight"], np.float32)
        _set(params, fpath[:-1], fpath[-1],
             {"kernel": w.T,
              "bias": np.asarray(sd[f"{tname}.bias"], np.float32)})

    return params, stats


def load_speaker_checkpoint(path: str) -> tuple[dict, dict]:
    """One-shot torch-CPU read of a ``__S__.``-prefixed checkpoint ->
    ``(params, batch_stats)`` for ``SpeakerRAVE`` (reference
    ``rave/model.py:165-174``)."""
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(raw, "state_dict"):
        raw = raw.state_dict()
    if "state_dict" in raw and isinstance(raw["state_dict"], dict):
        raw = raw["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in raw.items()}
    speaker_sd, _pqmf = strip_speaker_statedict(sd)
    return convert_speaker_state(speaker_sd)


def install_speaker_weights(state, params: dict, stats: dict):
    """Overwrite a TrainState's speaker-encoder subtree (params +
    batch_stats) with converted pretrained weights, shape-checked."""
    import jax

    def _match(dst, src, where):
        dst_leaves = jax.tree.leaves(dst)
        src_leaves = jax.tree.leaves(src)
        if len(dst_leaves) != len(src_leaves):
            raise ValueError(
                f"{where}: {len(src_leaves)} converted leaves vs "
                f"{len(dst_leaves)} model leaves")
        # exact shape equality only: the converter above already applies
        # every needed transposition, so a size-match-but-shape-mismatch
        # leaf is a layout bug (e.g. an untransposed (out,in) matrix) that
        # a reshape would silently scramble into the model
        def _one(d, s):
            s = np.asarray(s, np.float32)
            if d.shape != s.shape:
                raise ValueError(
                    f"{where}: converted shape {s.shape} vs model "
                    f"{d.shape} (layout mismatch; refusing to reshape)")
            return s
        return jax.tree.map(_one, dst, src)

    gen = dict(state.gen_params)
    gen["speaker_encoder"] = _match(gen["speaker_encoder"], params,
                                    "speaker params")
    model_state = dict(state.model_state)
    bs = dict(model_state.get("batch_stats", {}))
    bs["speaker_encoder"] = _match(bs.get("speaker_encoder", {}), stats,
                                   "speaker batch_stats")
    model_state["batch_stats"] = bs
    return state.replace(gen_params=gen, model_state=model_state)
