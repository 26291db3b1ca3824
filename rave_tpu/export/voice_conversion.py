"""Realtime voice-conversion serving (the fork's nn~ surface).

Mirrors ``ScriptedRAVE`` in the reference (``scripts/export.py:58-539``):
* precomputed speaker-embedding table + ``speaker`` attribute selecting
  the conversion target (``export.py:75-97,427-479``),
* ``learn_target`` mode: stream target audio in, accumulate its speaker
  embedding online (running mean, like AdaIN's update rule),
* ``forward``: encode source chunk -> concat selected target embedding ->
  decode, all through the streaming caches.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RAVEConfig
from ..models.rave import RAVE


class VoiceConverter:
    def __init__(self, cfg: RAVEConfig, params, chunk_size: int = 4096,
                 speaker_table: Optional[np.ndarray] = None,
                 model_state=None):
        assert cfg.speaker_embedding_size > 0, \
            "voice conversion needs a speaker-conditioned model (v2_fork)"
        self.cfg = cfg
        self.chunk = chunk_size
        self.model = RAVE(cfg=cfg, streaming=True, train_mode=False)
        self.params = params
        self.speaker_table = (np.zeros((1, cfg.speaker_embedding_size),
                                       np.float32)
                              if speaker_table is None else speaker_table)
        self.speaker = 0
        self.learn_target = False
        self._target_acc = np.zeros(cfg.speaker_embedding_size, np.float32)
        self._target_n = 0

        x = jnp.zeros((1, chunk_size, 1), jnp.float32)
        rngs = {"params": jax.random.PRNGKey(0),
                "latent": jax.random.PRNGKey(1),
                "noise": jax.random.PRNGKey(2),
                "quantizer": jax.random.PRNGKey(3)}
        variables = self.model.init(rngs, x)
        self.init_cache = jax.tree.map(jnp.zeros_like,
                                       variables.get("cache", {}))
        # fresh copy: the live cache is DONATED to the step executables,
        # so it must never alias init_cache (kept pristine for reset /
        # serialisation)
        self.cache = self._fresh_cache()
        aux = {k: v for k, v in variables.items()
               if k not in ("params", "cache")}
        if model_state:
            # trained aux collections (speaker-encoder BatchNorm running
            # stats, RVQ codebooks) override the fresh init
            aux = {**aux, **{k: v for k, v in model_state.items()
                             if k != "cache"}}
        self.model_state = aux

        def fwd(cache, x, emb, pitch_feat):
            v = {"params": self.params, "cache": cache, **aux}
            # stateful caches: single mutable apply covering the whole
            # pqmf -> encode -> decode -> pqmf^-1 block step
            def run(mdl):
                bands = mdl.pqmf_forward(x)
                # speaker-conditioned fork: the encoder emits the raw
                # latent (n_out=1, no variational split -- see
                # RAVE.setup / reference model.py:349,358)
                z = mdl.encode_input(x, bands)
                e = jnp.broadcast_to(emb[None, None, :],
                                     (z.shape[0], z.shape[1], emb.shape[-1]))
                z = jnp.concatenate([z, e], axis=-1)
                if pitch_feat is not None:
                    z = jnp.concatenate([z, pitch_feat], axis=-1)
                y = mdl.decode_bands(z)
                return mdl.pqmf_inverse(y)

            y, upd = self.model.apply(
                v, method=lambda mdl: run(mdl), mutable=["cache"],
                rngs={"latent": jax.random.PRNGKey(4),
                      "noise": jax.random.PRNGKey(5)})
            return y, upd["cache"]

        def spk_embed(cache, x):
            v = {"params": self.params, "cache": cache, **aux}
            def run(mdl):
                bands = mdl.pqmf_forward(x)
                return mdl.speaker_embedding(bands)
            e, upd = self.model.apply(v, method=lambda mdl: run(mdl),
                                      mutable=["cache"])
            return e, upd["cache"]

        self._fwd_fn = fwd
        # donate the cache like StreamingRAVE: ring buffers update in
        # place instead of being copied every realtime block
        self._fwd = jax.jit(fwd, donate_argnums=(0,))
        self._spk = jax.jit(spk_embed, donate_argnums=(0,))

        # pitch conditioning (fork myforward: per-block f0 extraction +
        # utterance-stat normalisation, export.py:349-359).  f0 frames
        # need (frame_length - hop) past samples of context; the running
        # log-f0 reservoir replaces the reference's per-block median/std
        # (steadier on 4096-sample blocks).
        self._pitch = cfg.pitch_embedding_size > 0
        if self._pitch:
            from ..ops.pitch import yin_f0
            self._f0_frame = 2048
            self._f0_hop = cfg.pitch_hop
            self._f0_tail = np.zeros(self._f0_frame - self._f0_hop,
                                     np.float32)
            self._z_frames = chunk_size // cfg.total_ratio()
            self._logf0: list = []
            fcpe = None
            if cfg.pitch_estimator == "fcpe":
                # serving uses the same estimator the model trained with
                # (reference myforward extracts f0 via FCPE, export.py:349)
                from ..models.pitch_fcpe import fcpe_f0, get_fcpe_params
                fcpe = get_fcpe_params(cfg.pitch_ckpt)
            if fcpe is not None:
                self._f0_fn = jax.jit(lambda xc: fcpe_f0(
                    fcpe, xc, cfg.sampling_rate,
                    out_frames=max(1, xc.shape[1] // self._f0_hop),
                    fmin=cfg.pitch_fmin, fmax=cfg.pitch_fmax))
            else:
                self._f0_fn = jax.jit(lambda xc: yin_f0(
                    xc, cfg.sampling_rate, self._f0_frame, self._f0_hop,
                    cfg.pitch_fmin, cfg.pitch_fmax))

    def _pitch_feature(self, x_chunk: np.ndarray) -> jnp.ndarray:
        """(1, Tz, C) normalised-f0 feature for one block."""
        cfg = self.cfg
        xc = np.concatenate([self._f0_tail, x_chunk.astype(np.float32)])
        self._f0_tail = xc[-(self._f0_frame - self._f0_hop):]
        f0 = np.asarray(self._f0_fn(xc[None]))[0]
        voiced = f0 > 0
        if voiced.any():
            self._logf0.extend(np.log(f0[voiced]).tolist())
            self._logf0 = self._logf0[-500:]
        if self._logf0:
            med = float(np.median(self._logf0))
            std = float(max(np.std(self._logf0), 1e-3))
        else:
            med, std = float(np.log(160.0)), 0.5
        feat = np.where(voiced, (np.log(np.maximum(f0, 1e-6)) - med) / std,
                        0.0).astype(np.float32)
        # linear resample f0 frames -> latent frames
        n = len(feat)
        pos = np.linspace(0, n - 1, self._z_frames) if n > 1 \
            else np.zeros(self._z_frames)
        feat = np.interp(pos, np.arange(n), feat)
        feat = np.tile(feat[None, :, None],
                       (1, 1, cfg.pitch_embedding_size))
        return jnp.asarray(feat, jnp.float32)

    # ---- nn~-style attributes (reference export.py:427-479) -----------

    def set_speaker(self, idx: int):
        self.speaker = int(np.clip(idx, 0, len(self.speaker_table) - 1))
        # an explicit speaker choice overrides any previously learned
        # target (otherwise the learned mean would shadow the table row
        # forever once _target_n > 0)
        self._target_n = 0
        self._target_acc[:] = 0

    def set_learn_target(self, on: bool):
        # NOTE: live enrollment averages per-chunk batch-1 embeddings,
        # which is only meaningful for pretrained (running-stat) speaker
        # encoders -- the reference's own use of this attribute
        # (export.py:447-452).  A from-scratch cohort-norm encoder
        # whitens every lone chunk to the same constant; enroll such
        # targets offline via embed_speaker_audio(..., cohort=...) /
        # build_speaker_table instead.
        if on and not self.learn_target:
            self._target_acc[:] = 0
            self._target_n = 0
        self.learn_target = bool(on)

    def _fresh_cache(self):
        return jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype),
                            self.init_cache)

    def reset(self):
        self.cache = self._fresh_cache()
        if self._pitch:
            self._f0_tail[:] = 0
            self._logf0 = []

    def current_embedding(self) -> np.ndarray:
        if self._target_n > 0:
            return self._target_acc / self._target_n
        return self.speaker_table[self.speaker]

    # ---- speaker table (reference export.py:75-97 precomputes the
    # target embeddings from wav files at export time) -------------------

    def embed_speaker_audio(self, x: np.ndarray,
                            segments: int = 4,
                            cohort: np.ndarray | None = None) -> np.ndarray:
        """Speaker embedding (256,) from target audio: the utterance is
        chunked into up to ``segments`` segments embedded as ONE offline
        batch, mean-pooled.  For from-scratch (cohort-norm) speaker
        encoders (models.speaker.CohortNorm), pass ``cohort`` --
        OTHER-speaker audio embedded jointly: CohortNorm whitens the
        pooled statistics across the batch, so a single-item batch
        returns the norm's bias through the affine output layer for
        every speaker, and a same-speaker segment batch mean-pools back
        to that same constant (centering removes exactly the cohort
        mean).  Only segments of a cohort that SPANS speakers retain an
        identity direction after whitening.  Pretrained (running-stat)
        encoders ignore all of this; segment averaging is then just the
        standard ECAPA enrollment recipe."""
        from ..models.rave import RAVE
        x = x.astype(np.float32)
        seg_len = max(32768, len(x) // max(1, segments))
        n = max(1, len(x) // seg_len)
        if n == 1:
            # too short to chunk: split in half so cohort stats exist
            seg_len = max(8192, len(x) // 2)
            n = max(1, len(x) // seg_len)
        segs = np.stack([x[i * seg_len:(i + 1) * seg_len]
                         for i in range(n)])[..., None]
        n_tgt = len(segs)
        if cohort is not None:
            c = cohort.astype(np.float32)
            m = max(1, min(len(c) // seg_len, n))
            csegs = np.stack([c[i * seg_len:(i + 1) * seg_len]
                              for i in range(m)])[..., None]
            segs = np.concatenate([segs, csegs], axis=0)
        mdl = RAVE(cfg=self.cfg, streaming=False, train_mode=False)
        variables = {"params": self.params, **self.model_state}
        bands = mdl.apply(variables, jnp.asarray(segs),
                          method=RAVE.pqmf_forward)
        e = mdl.apply(variables, bands, method=RAVE.speaker_embedding)
        return np.asarray(jnp.mean(e[:n_tgt], axis=0))

    @staticmethod
    def build_speaker_table(cfg: RAVEConfig, params,
                            wav_paths: list,
                            model_state=None) -> np.ndarray:
        """Embedding table from target-speaker wavs (the reference bakes
        speaker1..speaker4 buffers into ScriptedRAVE, export.py:75-97).
        Each speaker is embedded with the OTHER speakers' audio as its
        whitening cohort (see ``embed_speaker_audio``: for cohort-norm
        encoders a lone speaker whitens to a constant, so a multi-wav
        table built in isolation would collapse to identical rows)."""
        from ..data.audio_io import load_wav
        vc = VoiceConverter(cfg, params, model_state=model_state)
        clips = []
        for p in wav_paths:
            x, sr = load_wav(p)
            if sr != cfg.sampling_rate:
                raise ValueError(f"{p}: {sr} != model sr {cfg.sampling_rate}")
            clips.append(x)
        rows = []
        for i, x in enumerate(clips):
            others = [c for j, c in enumerate(clips) if j != i]
            cohort = np.concatenate(others) if others else None
            rows.append(vc.embed_speaker_audio(x, cohort=cohort))
        return np.stack(rows).astype(np.float32)

    # ---- AOT serialisation ----------------------------------------------

    def serialize(self, out_dir: str):
        """StableHLO artifacts of the conversion step for PJRT hosts:

        * ``convert.stablehlo`` / ``convert.mlir`` -- one block of
          ``myforward``: (cache, x_chunk, emb[, pitch_feat]) ->
          (y_chunk, cache) (reference registers myforward on the nn~
          surface, export.py:229-240,343-413);
        * ``spk_embed.stablehlo`` -- (cache, x_chunk) -> (emb, cache) for
          learn-target streaming;
        * ``speaker_table.npy`` (written by the CLI), manifest + initial
          cache for the C++ host (native/pjrt_host.cpp).
        """
        from pathlib import Path
        import json
        from jax import export as jexport
        from .streaming import write_pjrt_artifacts

        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        cache = jax.tree.map(jnp.zeros_like, self.init_cache)
        x = jnp.zeros((1, self.chunk, 1), jnp.float32)
        emb = jnp.zeros((self.cfg.speaker_embedding_size,), jnp.float32)
        feat = (jnp.zeros((1, self.chunk // self.cfg.total_ratio(),
                           self.cfg.pitch_embedding_size), jnp.float32)
                if self._pitch else None)
        exp = jexport.export(self._fwd)(cache, x, emb, feat)
        (out / "convert.stablehlo").write_bytes(exp.serialize())
        (out / "spk_embed.stablehlo").write_bytes(
            jexport.export(self._spk)(cache, x).serialize())
        write_pjrt_artifacts(out, exp, cache, chunk=self.chunk,
                             sampling_rate=self.cfg.sampling_rate,
                             batch=1, prefix="convert")
        meta = dict(chunk_size=self.chunk,
                    sampling_rate=self.cfg.sampling_rate,
                    speaker_embedding_size=self.cfg.speaker_embedding_size,
                    pitch_embedding_size=self.cfg.pitch_embedding_size,
                    pitch_hop=self.cfg.pitch_hop,
                    n_speakers=len(self.speaker_table),
                    config=self.cfg.name)
        (out / "convert_meta.json").write_text(json.dumps(meta, indent=2))
        np.save(out / "speaker_table.npy", self.speaker_table)

        if self._pitch:
            # fully self-contained variant for no-Python hosts: f0
            # extraction in-graph (the reference's myforward runs YIN
            # inside the TorchScript graph, export.py:349-359); the YIN
            # left-context rides in the exported state pytree and the
            # per-block stats are per-utterance like myforward's
            cfg = self.cfg
            tail_len = self._f0_frame - self._f0_hop
            z_frames = self.chunk // cfg.total_ratio()

            def fwd_pg(carry, x, emb):
                from ..ops.pitch import (f0_norm_feature, voiced_log_stats,
                                         yin_f0)
                xc = jnp.concatenate([carry["f0_tail"], x[:, :, 0]], axis=1)
                f0 = yin_f0(xc, cfg.sampling_rate, self._f0_frame,
                            self._f0_hop, cfg.pitch_fmin, cfg.pitch_fmax)
                med, std = voiced_log_stats(f0)
                feat = f0_norm_feature(f0, med, std, z_frames,
                                       cfg.pitch_embedding_size)
                y, cache2 = self._fwd_fn(carry["cache"], x, emb, feat)
                return y, {"cache": cache2,
                           "f0_tail": xc[:, -tail_len:]}

            carry = {"cache": cache,
                     "f0_tail": jnp.zeros((1, tail_len), jnp.float32)}
            exp_pg = jexport.export(jax.jit(fwd_pg, donate_argnums=(0,)))(
                carry, x, emb)
            (out / "convert_pg.stablehlo").write_bytes(exp_pg.serialize())
            write_pjrt_artifacts(out, exp_pg, carry, chunk=self.chunk,
                                 sampling_rate=cfg.sampling_rate,
                                 batch=1, prefix="convert_pg")
        return out

    # ---- per-block processing -----------------------------------------

    def forward(self, x_chunk: np.ndarray) -> np.ndarray:
        xj = jnp.asarray(x_chunk.reshape(1, -1, 1), jnp.float32)
        if self.learn_target:
            e, self.cache = self._spk(self.cache, xj)
            self._target_acc += np.asarray(e[0])
            self._target_n += 1
            return np.zeros_like(x_chunk)
        emb = jnp.asarray(self.current_embedding())
        feat = self._pitch_feature(x_chunk.reshape(-1)) if self._pitch \
            else None
        y, self.cache = self._fwd(self.cache, xj, emb, feat)
        return np.asarray(y[0, :, 0])
