"""Latent-space PCA statistics (upstream RAVE behaviour, restored).

The reference computes a PCA of validation latents to obtain the
``latent_pca`` / ``latent_mean`` / ``fidelity`` buffers used by export
fidelity-cropping -- present but commented out in the fork
(``rave/model.py:753-779``).  Here it is a first-class artifact saved to
the run dir and consumed by the streaming export.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def fit_latent_pca(zs: np.ndarray) -> dict:
    """zs: (N, latent) collected posterior means -> pca dict."""
    mean = zs.mean(0)
    z = zs - mean
    cov = z.T @ z / max(len(z) - 1, 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    components = evecs[:, order].T          # (latent, latent), rows = PCs
    var = np.clip(evals[order], 0, None)
    var = var / max(var.sum(), 1e-12)
    fidelity = np.cumsum(var)
    return dict(latent_pca=components.astype(np.float32),
                latent_mean=mean.astype(np.float32),
                fidelity=fidelity.astype(np.float32))


def save_latent_stats(run_dir: str, stats: dict) -> Path:
    p = Path(run_dir) / "latent_stats.npz"
    np.savez(p, **stats)
    return p


def load_latent_stats(run_dir: str) -> dict | None:
    p = Path(run_dir) / "latent_stats.npz"
    if not p.exists():
        return None
    with np.load(p) as z:
        return {k: z[k] for k in z.files}


def n_dims_for_fidelity(fidelity: np.ndarray, target: float = 0.95) -> int:
    """Smallest latent count reaching the cumulative-variance target
    (reference export fidelity cropping, ``scripts/export.py:482-500``)."""
    return int(np.argmax(fidelity > target)) + 1
