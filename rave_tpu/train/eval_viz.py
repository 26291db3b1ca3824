"""Speaker-embedding evaluation & visualization.

Counterpart of the reference's ``train_rave.py --eval`` path
(``train_rave.py:193-236``): compute frozen speaker embeddings over the
dataset and project them to 2D (t-SNE, PCA fallback) so a run can be
inspected for speaker-cluster separation.  Writes ``speaker_tsne.png``
and ``speaker_embeddings.json`` into the run directory.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np


def compute_speaker_embeddings(run_dir: str, db_path: str,
                               max_items: int = 512,
                               batch_size: int = 8):
    """Embed up to ``max_items`` dataset chunks with the run's (frozen)
    speaker encoder.  Returns ``(embeddings [N,256], speaker_ids [N])``."""
    from ..data.dataset import AudioDataset
    from ..export.streaming import load_run
    from ..models.rave import RAVE

    cfg, state = load_run(run_dir)
    if cfg.speaker_embedding_size <= 0:
        raise ValueError("run has no speaker encoder "
                         "(speaker_embedding_size == 0)")
    ds = AudioDataset(db_path, n_signal=cfg.n_signal)
    model = RAVE(cfg=cfg, train_mode=False)
    params = state.ema_params if state.ema_params is not None \
        else state.gen_params
    variables = {"params": params, **(state.model_state or {})}

    @jax.jit
    def embed(x):
        bands = model.apply(variables, x, method=RAVE.pqmf_forward)
        return model.apply(variables, bands,
                           method=RAVE.speaker_embedding)

    idx = np.linspace(0, len(ds) - 1, min(max_items, len(ds))).astype(int)
    embs, spks = [], []
    for start in range(0, len(idx), batch_size):
        chunk = idx[start:start + batch_size]
        if len(chunk) < batch_size:  # static shapes: pad the tail batch
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch_size - len(chunk))])
        xs, ss = [], []
        for i in chunk:
            item = ds[int(i)]
            xs.append(np.asarray(item["x"], np.float32))
            ss.append(int(item.get("speaker", 0)))
        x = np.stack(xs)[..., None] if xs[0].ndim == 1 else np.stack(xs)
        e = np.asarray(embed(x))
        n = min(batch_size, len(idx) - start)
        embs.append(e[:n])
        spks.extend(ss[:n])
    return np.concatenate(embs), np.asarray(spks, np.int32)


def project_2d(embs: np.ndarray, perplexity: float = 30.0) -> np.ndarray:
    """t-SNE projection (like the reference's sklearn TSNE use,
    ``train_rave.py:205-214``); PCA fallback if sklearn is unavailable."""
    try:
        from sklearn.manifold import TSNE
        per = min(perplexity, max(2.0, (len(embs) - 1) / 3.0))
        return TSNE(n_components=2, perplexity=per,
                    init="pca", random_state=42).fit_transform(embs)
    except Exception:
        c = embs - embs.mean(0)
        _, _, vt = np.linalg.svd(c, full_matrices=False)
        return c @ vt[:2].T


def eval_main(args) -> None:
    run_dir = Path(args.run)
    embs, spks = compute_speaker_embeddings(
        str(run_dir), args.db_path, max_items=args.max_items)
    pts = project_2d(embs)
    out = {"points": pts.tolist(), "speakers": spks.tolist()}
    (run_dir / "speaker_embeddings.json").write_text(json.dumps(out))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 6))
        sc = ax.scatter(pts[:, 0], pts[:, 1], c=spks, s=10,
                        cmap="tab20", alpha=0.8)
        ax.set_title("speaker embeddings (t-SNE)")
        fig.colorbar(sc, ax=ax, label="speaker id")
        fig.savefig(run_dir / "speaker_tsne.png", dpi=120,
                    bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {run_dir / 'speaker_tsne.png'}")
    except Exception as e:  # headless plot is best-effort
        print(f"plot skipped ({e!r}); embeddings JSON written")
    print(f"embedded {len(spks)} chunks, "
          f"{len(set(spks.tolist()))} speakers")
