"""Discrete-unit targets for the voice-conversion CE loss.

The reference queries a frozen HuBERT teacher per batch at train time
(``rave/model.py:240-241,303-307`` via torch.hub, network I/O in the hot
loop).  TPU-native design: units are **precomputed in the data pipeline**
and stored alongside the record store -- the train step just gathers.

Two providers:
* ``HubertUnitProvider`` -- reads units precomputed by an external HuBERT
  pipeline (``units.npy`` aligned with ``data.bin`` records).
* ``MelKMeansUnitProvider`` -- a self-contained stand-in: k-means over
  log-mel frames (the same recipe HuBERT-discrete uses over HuBERT
  features).  Lets the full CE path train end-to-end without torch.hub;
  swap in real HuBERT units for production voice conversion.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..ops.stft import mel_filterbank


def log_mel_frames(x: np.ndarray, sr: int, n_fft: int = 1024,
                   hop: int = 882, n_mels: int = 40) -> np.ndarray:
    """(T,) audio -> (frames, n_mels) log-mel, numpy only.

    Default hop 882 = 20 ms at 44.1 kHz, matching HuBERT's 50 Hz unit
    rate (reference interpolates its latent to 148 frames for ~3 s,
    ``rave/model.py:123``)."""
    n = (len(x) - n_fft) // hop + 1
    if n <= 0:
        return np.zeros((0, n_mels), np.float32)
    idx = np.arange(n_fft)[None] + hop * np.arange(n)[:, None]
    frames = x[idx] * np.hanning(n_fft)
    mag = np.abs(np.fft.rfft(frames, axis=-1))
    mel = mel_filterbank(sr, n_fft, n_mels)
    return np.log1p(mag @ mel.T).astype(np.float32)


class MelKMeansUnitProvider:
    def __init__(self, num_units: int = 100, sr: int = 44100,
                 hop: int = 882, seed: int = 0):
        self.num_units = num_units
        self.sr = sr
        self.hop = hop
        self.codebook: np.ndarray | None = None
        self.seed = seed

    def fit(self, dataset, max_items: int = 200, iters: int = 20):
        rng = np.random.default_rng(self.seed)
        feats = []
        idx = rng.permutation(len(dataset))[:max_items]
        for i in idx:
            f = log_mel_frames(dataset[int(i)]["x"], self.sr, hop=self.hop)
            feats.append(f)
        X = np.concatenate(feats)
        cb = X[rng.permutation(len(X))[: self.num_units]]
        for _ in range(iters):
            d = ((X[:, None] - cb[None]) ** 2).sum(-1)
            a = d.argmin(1)
            for k in range(self.num_units):
                m = a == k
                if m.any():
                    cb[k] = X[m].mean(0)
        self.codebook = cb
        return self

    def __call__(self, x: np.ndarray) -> np.ndarray:
        """(T,) audio -> (frames,) int32 unit ids."""
        assert self.codebook is not None, "fit() first"
        f = log_mel_frames(x, self.sr, hop=self.hop)
        d = ((f[:, None] - self.codebook[None]) ** 2).sum(-1)
        return d.argmin(1).astype(np.int32)

    def save(self, path: str):
        np.save(path, self.codebook)

    @classmethod
    def load(cls, path: str, **kw) -> "MelKMeansUnitProvider":
        p = cls(**kw)
        p.codebook = np.load(path)
        return p


class HubertUnitProvider:
    """Precomputed per-record units: ``units.npy`` (count, frames) int32
    aligned with the record store."""

    def __init__(self, db_path: str):
        self.units = np.load(Path(db_path) / "units.npy", mmap_mode="r")

    def for_record(self, i: int) -> np.ndarray:
        return np.asarray(self.units[i], np.int32)


def precompute_units(dataset, provider, out_path: str) -> np.ndarray:
    """Run a unit provider over every record and save ``units.npy``."""
    rows = [provider(dataset[i]["x"]) for i in range(len(dataset))]
    n = min(len(r) for r in rows)
    arr = np.stack([r[:n] for r in rows]).astype(np.int32)
    np.save(Path(out_path) / "units.npy", arr)
    return arr
