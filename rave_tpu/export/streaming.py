"""Streaming export + realtime chunked inference.

Counterpart of reference L6 (``scripts/export.py``): the model is rebuilt
in streaming mode (conv caches in the ``"cache"`` collection -- the
reference flips the global ``cc.use_cached_conv(True)`` before build,
``export.py:543``), trained offline params are loaded unchanged, and the
per-block step functions are jitted / AOT-serialised:

* ``encode_step(cache, x_chunk) -> (z, cache)``
* ``decode_step(cache, z) -> (y_chunk, cache)``
* ``forward_step(cache, x_chunk) -> (y_chunk, cache)``

Per-block latency == the statically-known ``total_delay`` (the
reference's ``cumulative_delay`` attribute, computed here at build time).
Artifacts serialise via ``jax.export`` (StableHLO) so any PJRT host --
including a C++ shim, the nn~ analogue -- can run them.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RAVEConfig
from ..models.rave import RAVE


def _zeros_like_tree(tree):
    """Fresh zero buffers with the same structure/shapes/dtypes.

    The step executables donate their cache argument, so a live cache
    tree must never alias ``init_cache`` -- the first call would delete
    the pristine buffers (see :meth:`StreamingRAVE.reset`)."""
    return jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), tree)


def _copy_tree(tree):
    """Fresh VALUE copies (same donation-aliasing rule as
    :func:`_zeros_like_tree`, for state whose initial value is not
    zero, e.g. AdaIN std buffers)."""
    return jax.tree.map(lambda a: jnp.array(a), tree)


class StreamingRAVE:
    """Stateful chunked inference driver around the streaming model."""

    def __init__(self, cfg: RAVEConfig, params, chunk_size: int = 2048,
                 batch_size: int = 1, stereo: bool = False,
                 target_sr: Optional[int] = None, model_state=None):
        if chunk_size % cfg.total_ratio():
            raise ValueError(
                f"chunk_size must be a multiple of the total stride "
                f"{cfg.total_ratio()}, got {chunk_size}")
        if stereo and cfg.adain:
            # reference parity: AdaIN tracks per-batch-slot stats that the
            # batch duplication would corrupt (export.py:116-117)
            raise ValueError("stereo mode not supported with AdaIN")
        if cfg.use_mel_encoder and chunk_size % cfg.mel_hop:
            # hybrid streaming (which the REFERENCE cannot do -- its
            # cached_conv machinery does not cache the Spectrogram) rides
            # MelFrontEnd's carried sample cache; chunks must land on mel
            # frame boundaries
            raise ValueError(
                f"hybrid streaming needs chunk_size to be a multiple of "
                f"mel_hop {cfg.mel_hop}, got {chunk_size}")
        self.cfg = cfg
        self.chunk = chunk_size
        self.batch = batch_size
        self.stereo = stereo
        self.model = RAVE(cfg=cfg, streaming=True, train_mode=False)
        self.params = params

        x = jnp.zeros((batch_size, chunk_size, 1), jnp.float32)
        rngs = {"params": jax.random.PRNGKey(0),
                "latent": jax.random.PRNGKey(1),
                "noise": jax.random.PRNGKey(2),
                "quantizer": jax.random.PRNGKey(3)}
        variables = self.model.init(rngs, x)
        self.init_cache = jax.tree.map(jnp.zeros_like,
                                       variables.get("cache", {}))
        self.aux_state = {k: v for k, v in variables.items()
                          if k not in ("params", "cache", "adain")}
        if model_state:
            # trained auxiliary collections (RVQ EMA codebooks, BatchNorm
            # running stats, AdaIN statistics) must override the fresh
            # init -- serving re-initialised codebooks/stats would decode
            # garbage (reference checkpoints carry these as buffers)
            self.aux_state = {**self.aux_state,
                              **{k: v for k, v in model_state.items()
                                 if k not in ("cache", "adain")}}

        # AdaIN timbre-transfer state is LIVE serving state, not frozen
        # aux: its running stats update while learn_source/learn_target
        # are on and the flags are host-settable between blocks (the
        # reference exposes them as nn~ attributes, export.py:427-479)
        self.has_adain = "adain" in variables
        if self.has_adain:
            src = (model_state or {}).get("adain", variables["adain"])
            self.init_adain = jax.tree.map(jnp.asarray, dict(src))
        else:
            self.init_adain = {}
        self._mut = ["cache", "adain"] if self.has_adain else ["cache"]

        def _vars(cache, adain):
            v = {"params": self.params, "cache": cache, **self.aux_state}
            if self.has_adain:
                v["adain"] = adain
            return v

        def _split_upd(upd, adain):
            return upd["cache"], (upd["adain"] if self.has_adain else adain)

        def forward(cache, adain, x):
            out, upd = self.model.apply(
                _vars(cache, adain), x, mutable=self._mut,
                rngs={"latent": jax.random.PRNGKey(4),
                      "noise": jax.random.PRNGKey(5)})
            return out, *_split_upd(upd, adain)

        def encode(cache, adain, x):
            z, upd = self.model.apply(
                _vars(cache, adain), x, method=RAVE.encode,
                mutable=self._mut,
                rngs={"latent": jax.random.PRNGKey(4)})
            return z, *_split_upd(upd, adain)

        def decode(cache, adain, z):
            y, upd = self.model.apply(
                _vars(cache, adain), z, method=RAVE.decode,
                mutable=self._mut,
                rngs={"noise": jax.random.PRNGKey(5),
                      "latent": jax.random.PRNGKey(7)})
            return y, *_split_upd(upd, adain)

        # donate cache + adain: the ring buffers are updated in place
        # instead of copied every block (HBM traffic halves on the cache
        # tree; call sites always rebind to the returned state)
        self._forward = jax.jit(forward, donate_argnums=(0, 1))
        self._encode = jax.jit(encode, donate_argnums=(0, 1))
        self._decode = jax.jit(decode, donate_argnums=(0, 1))

        if stereo:
            # fake stereo (reference export.py:322-337): one encoding,
            # the decoder run on batch-duplicated z, channels = the two
            # decodes.  The stereo decoder keeps its own 2B-batch cache.
            z = jnp.zeros((2 * batch_size,
                           chunk_size // cfg.total_ratio(),
                           cfg.decoder_latent_size()), jnp.float32)
            dec_vars = self.model.init(rngs, z, method=RAVE.decode)
            self.init_dec_cache = jax.tree.map(jnp.zeros_like,
                                               dec_vars.get("cache", {}))
            self.dec_cache = _zeros_like_tree(self.init_dec_cache)

        self.target_sr = target_sr
        if target_sr is not None and target_sr != cfg.sampling_rate:
            # host-rate adaptation (reference ScriptedRAVE resampler,
            # export.py:377-378,404-408): kaiser resampler convs with
            # their own streaming caches on each side of the model
            from ..ops.conv import StreamSetup
            from ..ops.resampler import Resampler
            rs = Resampler(target_sr=target_sr, model_sr=cfg.sampling_rate,
                           ss=StreamSetup(
                               mode="causal" if cfg.causal else "centered",
                               streaming=True))
            self.rs_ratio = rs.ratio
            xin = jnp.zeros((batch_size, chunk_size * rs.ratio, 1),
                            jnp.float32)
            dvars = rs.init(jax.random.PRNGKey(0), xin,
                            method=Resampler.to_model_sr)
            out_b = 2 * batch_size if stereo else batch_size
            yin = jnp.zeros((out_b, chunk_size, 1), jnp.float32)
            uvars = rs.init(jax.random.PRNGKey(0), yin,
                            method=Resampler.from_model_sr)
            self.init_down_cache = jax.tree.map(
                jnp.zeros_like, dvars.get("cache", {}))
            self.init_up_cache = jax.tree.map(
                jnp.zeros_like, uvars.get("cache", {}))
            self.down_cache = _zeros_like_tree(self.init_down_cache)
            self.up_cache = _zeros_like_tree(self.init_up_cache)

            def rs_down(cache, x):
                y, upd = rs.apply({"cache": cache}, x,
                                  method=Resampler.to_model_sr,
                                  mutable=["cache"])
                return y, upd["cache"]

            def rs_up(cache, y):
                z, upd = rs.apply({"cache": cache}, y,
                                  method=Resampler.from_model_sr,
                                  mutable=["cache"])
                return z, upd["cache"]

            self._rs_down = jax.jit(rs_down, donate_argnums=(0,))
            self._rs_up = jax.jit(rs_up, donate_argnums=(0,))
        else:
            self.rs_ratio = 1

        if cfg.latent_head == "discrete":
            # RVQ-indices surface (reference DiscreteScriptedRAVE,
            # export.py:503-517): the compact latent is integer codes.
            def encode_idx(cache, adain, x):
                idx, upd = self.model.apply(
                    _vars(cache, adain),
                    x, method=RAVE.encode_indices, mutable=self._mut)
                return idx, *_split_upd(upd, adain)

            def decode_idx(cache, adain, idx):
                y, upd = self.model.apply(
                    _vars(cache, adain),
                    idx, method=RAVE.decode_indices, mutable=self._mut,
                    rngs={"latent": jax.random.PRNGKey(6),
                          "noise": jax.random.PRNGKey(5)})
                return y, *_split_upd(upd, adain)

            self._encode_idx = jax.jit(encode_idx, donate_argnums=(0, 1))
            self._decode_idx = jax.jit(decode_idx, donate_argnums=(0, 1))

        self.cache = _zeros_like_tree(self.init_cache)
        self.adain = _copy_tree(self.init_adain)

    # -- latency ----------------------------------------------------------

    def total_delay_samples(self) -> int:
        """Static end-to-end streaming delay in audio samples.

        Composite chain (all verified by the full-graph equivalence test):
        PQMF analysis delay feeds the encoder as ``in_delay`` (its strided
        convs re-align it), the encoder's latent-frame delay scales
        linearly through the decoder's upsamplers, the decoder's own
        band-frame delay and the PQMF synthesis delay add on top.
        """
        cfg = self.cfg
        from ..ops.conv import StreamSetup
        from ..ops.pqmf import _pqmf_kernels
        from ..models.rave import band_frame_delay
        ss = StreamSetup(mode="causal" if cfg.causal else "centered",
                         streaming=True)
        if cfg.n_band > 1:
            _, _, _, pq_s = _pqmf_kernels(cfg.pqmf_attenuation, cfg.n_band)
        else:
            pq_s = 0
        # band_frame_delay uses the SAME builders as RAVE.setup, so mel /
        # v1 / fork variants can't drift from the served graph
        total_band_frames = band_frame_delay(cfg, ss) + pq_s
        return total_band_frames * cfg.n_band

    # -- stateful API (nn~-style) ----------------------------------------

    @property
    def host_chunk(self) -> int:
        """Per-call audio chunk size at the host sample rate."""
        return self.chunk * self.rs_ratio

    def reset(self):
        # fresh zero buffers: the previous cache arrays were donated to
        # the step executables and must not be re-aliased
        self.cache = _zeros_like_tree(self.init_cache)
        self.adain = _copy_tree(self.init_adain)
        if self.stereo:
            self.dec_cache = _zeros_like_tree(self.init_dec_cache)
        if self.rs_ratio > 1:
            self.down_cache = _zeros_like_tree(self.init_down_cache)
            self.up_cache = _zeros_like_tree(self.init_up_cache)

    # -- AdaIN timbre-transfer controls (reference nn~ attributes
    # learn_source/learn_target/reset_source/reset_target,
    # scripts/export.py:427-479) ------------------------------------------

    def _set_adain(self, updater):
        if not self.has_adain:
            raise ValueError("model has no AdaIN layers (adain config)")

        def walk(node):
            if isinstance(node, dict) and "learn_x" in node:
                return updater(dict(node))
            if isinstance(node, dict):
                return {k: walk(v) for k, v in node.items()}
            return node

        self.adain = jax.tree.map(jnp.array, walk(self.adain))

    def set_learn_source(self, on: bool):
        """While on, AdaIN accumulates SOURCE statistics from the stream
        (reference learn_source attribute)."""
        v = jnp.float32(1.0 if on else 0.0)
        self._set_adain(lambda d: {**d, "learn_x": v})

    def set_learn_target(self, on: bool):
        """While on, AdaIN accumulates TARGET statistics (takes priority
        over source learning, like the reference's flag logic,
        rave/blocks.py:884-906)."""
        v = jnp.float32(1.0 if on else 0.0)
        self._set_adain(lambda d: {**d, "learn_y": v})

    def reset_source(self):
        self._set_adain(lambda d: {
            **d, "mean_x": jnp.zeros_like(d["mean_x"]),
            "std_x": jnp.ones_like(d["std_x"]),
            "num_update_x": jnp.zeros_like(d["num_update_x"])})

    def reset_target(self):
        self._set_adain(lambda d: {
            **d, "mean_y": jnp.zeros_like(d["mean_y"]),
            "std_y": jnp.ones_like(d["std_y"]),
            "num_update_y": jnp.zeros_like(d["num_update_y"])})

    def _to_model_rate(self, x_chunk: np.ndarray) -> jax.Array:
        x = jnp.asarray(x_chunk)
        if self.rs_ratio > 1:
            x, self.down_cache = self._rs_down(self.down_cache, x)
        return x

    def _from_model_rate(self, y: jax.Array) -> jax.Array:
        if self.rs_ratio > 1:
            y, self.up_cache = self._rs_up(self.up_cache, y)
        return y

    def forward(self, x_chunk: np.ndarray) -> np.ndarray:
        if self.stereo:
            return self.decode(self.encode(x_chunk))
        x = self._to_model_rate(x_chunk)
        y, self.cache, self.adain = self._forward(self.cache, self.adain, x)
        return np.asarray(self._from_model_rate(y))

    def encode(self, x_chunk: np.ndarray) -> np.ndarray:
        z, self.cache, self.adain = self._encode(
            self.cache, self.adain, self._to_model_rate(x_chunk))
        return np.asarray(z)

    def decode(self, z: np.ndarray) -> np.ndarray:
        if self.stereo:
            zz = jnp.concatenate([jnp.asarray(z)] * 2, axis=0)
            y, self.dec_cache, self.adain = self._decode(
                self.dec_cache, self.adain, zz)
            y = self._from_model_rate(y)
            B = z.shape[0]
            return np.concatenate([np.asarray(y[:B]), np.asarray(y[B:])],
                                  axis=-1)
        y, self.cache, self.adain = self._decode(self.cache, self.adain,
                                                 jnp.asarray(z))
        return np.asarray(self._from_model_rate(y))

    def encode_indices(self, x_chunk: np.ndarray) -> np.ndarray:
        """Audio chunk -> RVQ indices (discrete head only)."""
        idx, self.cache, self.adain = self._encode_idx(
            self.cache, self.adain, jnp.asarray(x_chunk))
        return np.asarray(idx)

    def decode_indices(self, idx: np.ndarray) -> np.ndarray:
        """RVQ indices -> audio chunk (discrete head only)."""
        y, self.cache, self.adain = self._decode_idx(
            self.cache, self.adain, jnp.asarray(idx))
        return np.asarray(y)

    def process_file(self, x: np.ndarray) -> np.ndarray:
        """Stream a full signal (at the host rate) chunk by chunk."""
        self.reset()
        hc = self.host_chunk
        T = len(x) - len(x) % hc
        outs = []
        for i in range(0, T, hc):
            chunk = x[i:i + hc].reshape(1, -1, 1)
            outs.append(self.forward(chunk)[0, :, 0])
        return np.concatenate(outs)

    def process_file_scan(self, x: np.ndarray) -> np.ndarray:
        """Offline throughput mode: the whole chunk loop as ONE
        ``lax.scan``-compiled program (one dispatch per file instead of
        per chunk -- per-chunk dispatch latency dominates realtime-style
        loops on accelerators).  Identical math and state threading to
        :meth:`process_file`; mono, no resampler/stereo."""
        if self.stereo or self.rs_ratio > 1:
            return self.process_file(x)
        hc = self.host_chunk
        T = len(x) - len(x) % hc
        chunks = jnp.asarray(x[:T], jnp.float32).reshape(-1, 1, hc, 1)

        if not hasattr(self, "_scan_fwd"):
            fwd = self._forward

            @jax.jit
            def scan_fwd(cache, adain, chunks):
                def body(c, xc):
                    y, c2, a2 = fwd(c[0], c[1], xc)
                    return (c2, a2), y
                carry, ys = jax.lax.scan(body, (cache, adain), chunks)
                return ys, carry
            self._scan_fwd = scan_fwd

        ys, _ = self._scan_fwd(_zeros_like_tree(self.init_cache),
                               _copy_tree(self.init_adain), chunks)
        return np.asarray(ys).reshape(-1)

    # -- latent post/pre-processing (reference export.py:482-539) --------

    def set_latent_stats(self, stats: Optional[dict],
                         fidelity: float = 0.95):
        """Enable PCA fidelity cropping for the variational head
        (reference ``VariationalScriptedRAVE``, ``export.py:482-500``)."""
        self._stats = stats
        if stats is not None:
            from ..train.latent_stats import n_dims_for_fidelity
            self._n_keep = n_dims_for_fidelity(stats["fidelity"], fidelity)
        else:
            self._n_keep = None

    def postprocess_latent(self, z: np.ndarray) -> np.ndarray:
        """Latent -> compact user-facing representation."""
        head = self.cfg.latent_head
        if head == "variational" and getattr(self, "_stats", None) is not None:
            pca = self._stats["latent_pca"]
            mean = self._stats["latent_mean"]
            return (z - mean) @ pca.T[:, : self._n_keep]
        if head == "spherical":
            from ..models.latent import unit_norm_vector_to_angles
            return np.asarray(unit_norm_vector_to_angles(jnp.asarray(z)))
        return z

    def preprocess_latent(self, z: np.ndarray) -> np.ndarray:
        """Inverse of :meth:`postprocess_latent` (decode side)."""
        head = self.cfg.latent_head
        if head == "variational" and getattr(self, "_stats", None) is not None:
            pca = self._stats["latent_pca"]
            mean = self._stats["latent_mean"]
            full = np.zeros((*z.shape[:-1], pca.shape[0]), z.dtype)
            full[..., : z.shape[-1]] = z
            return full @ pca + mean
        if head == "spherical":
            from ..models.latent import angles_to_unit_norm_vector
            return np.asarray(angles_to_unit_norm_vector(jnp.asarray(z)))
        # (wasserstein/discrete noise-augmentation channels are re-sampled
        # inside RAVE.decode itself when the latent arrives without them)
        return z

    # -- AOT serialisation -----------------------------------------------

    def serialize(self, out_dir: str):
        """Serialise step functions as StableHLO (jax.export) + params.

        A PJRT-based C++ host (the nn~ analogue) can load these without
        Python; see ``native/README.md``.
        """
        from jax import export as jexport
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)

        x = jnp.zeros((self.batch, self.chunk, 1), jnp.float32)
        adain0 = _copy_tree(self.init_adain)
        exp = jexport.export(self._forward)(self.cache, adain0, x)
        (out / "forward.stablehlo").write_bytes(exp.serialize())
        # separate encode/decode steps (the nn~ surface registers all
        # three, reference export.py:229-240)
        z = jnp.zeros((self.batch, self.chunk // self.cfg.total_ratio(),
                       self.cfg.decoder_latent_size()), jnp.float32)
        (out / "encode.stablehlo").write_bytes(
            jexport.export(self._encode)(self.cache, adain0, x).serialize())
        (out / "decode.stablehlo").write_bytes(
            jexport.export(self._decode)(self.cache, adain0, z).serialize())

        # the serialized "initial" cache must be pristine zeros -- NOT the
        # live self.cache, which may hold mid-stream ring-buffer state if
        # the model was run before export.  AdaIN state (stats + the
        # learn_x/learn_y control scalars a host pokes to drive timbre
        # transfer) rides in the same carry.
        zero_cache = _zeros_like_tree(self.init_cache)
        flat, treedef = jax.tree.flatten(
            (zero_cache, _copy_tree(self.init_adain)))
        np.savez(out / "cache_init.npz",
                 **{f"c{i}": np.asarray(v) for i, v in enumerate(flat)})
        meta = dict(chunk_size=self.chunk, batch=self.batch,
                    sampling_rate=self.cfg.sampling_rate,
                    total_delay_samples=int(self.total_delay_samples()),
                    latent_size=self.cfg.latent_size,
                    adain=self.has_adain,
                    config=self.cfg.name)
        (out / "meta.json").write_text(json.dumps(meta, indent=2))
        self._serialize_pjrt_host_artifacts(out, exp, zero_cache)
        return out

    def _serialize_pjrt_host_artifacts(self, out: Path, exp,
                                       zero_cache) -> None:
        write_pjrt_artifacts(out, exp,
                             (zero_cache, _copy_tree(self.init_adain)),
                             chunk=self.chunk,
                             sampling_rate=self.cfg.sampling_rate,
                             batch=self.batch)


def write_pjrt_artifacts(out: Path, exp, cache, *, chunk: int,
                         sampling_rate: int, batch: int,
                         prefix: str = "forward") -> None:
    """Artifacts for the C++ PJRT host (``native/pjrt_host.cpp``):

    * ``<prefix>.mlir`` -- the raw (versioned) StableHLO module byte
      code, compilable by any PJRT plugin via ``PJRT_Client_Compile``
      (``exp.serialize()`` wraps it in jax.export metadata that only
      jax can parse);
    * ``compile_options.pb`` -- serialized default CompileOptionsProto;
    * ``<prefix=forward: io_manifest.txt, else <prefix>_manifest.txt>`` --
      the flat call convention, one line per leaf: inputs are the donated
      cache leaves (in pytree order) followed by the non-cache args;
      outputs are the result leaves followed by the updated cache leaves;
    * ``<prefix>_cache_init.bin`` (``cache_init.bin`` for forward) -- the
      initial cache leaves, concatenated raw little-endian in manifest
      order.
    """
    mlir = getattr(exp, "mlir_module_serialized", None)
    if mlir is None:
        mlir = exp.mlir_module().encode()
    (out / f"{prefix}.mlir").write_bytes(mlir)
    try:
        from jaxlib.xla_client import CompileOptions
        (out / "compile_options.pb").write_bytes(
            CompileOptions().SerializeAsString())
    except Exception:
        (out / "compile_options.pb").write_bytes(b"")

    lines = [f"meta {chunk} {sampling_rate} {batch}"]
    for kind, avals in (("in", exp.in_avals), ("out", exp.out_avals)):
        for a in jax.tree.leaves(avals):
            dims = " ".join(str(d) for d in a.shape)
            lines.append(
                f"{kind} {np.dtype(a.dtype).name} "
                f"{int(np.dtype(a.dtype).itemsize * np.prod(a.shape, dtype=np.int64))} "
                f"{len(a.shape)} {dims}".rstrip())
    manifest = "io_manifest.txt" if prefix == "forward" \
        else f"{prefix}_manifest.txt"
    (out / manifest).write_text("\n".join(lines) + "\n")

    flat, _ = jax.tree.flatten(cache)
    cbin = "cache_init.bin" if prefix == "forward" \
        else f"{prefix}_cache_init.bin"
    with open(out / cbin, "wb") as f:
        for v in flat:
            f.write(np.ascontiguousarray(np.asarray(v)).tobytes())


def load_run(run_dir: str, best: bool = False):
    """Rebuild config + latest params from a training run directory."""
    import dataclasses
    from ..config import RAVEConfig, DiscriminatorConfig
    from ..train.checkpoint import CheckpointManager
    from ..train.loop import init_state

    run = Path(run_dir)
    raw = json.loads((run / "config.json").read_text())
    dc = raw.pop("discriminator", None)
    cfg = RAVEConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                        for k, v in raw.items()})
    if dc:
        cfg.discriminator = DiscriminatorConfig(
            **{k: (tuple(v) if isinstance(v, list) else v)
               for k, v in dc.items()})
    state = init_state(cfg, jax.random.PRNGKey(0), batch_size=1)
    ckpt = CheckpointManager(run)
    state = ckpt.restore_best(state) if best else ckpt.restore(state)
    return cfg, state


def export_main(args) -> None:
    cfg, state = load_run(args.run, best=getattr(args, "best", False))
    # prefer EMA weights when trained with EMA (reference export's --ema,
    # scripts/export.py:560-572)
    params = state.ema_params if state.ema_params is not None \
        else state.gen_params
    sr = StreamingRAVE(cfg, params, chunk_size=args.chunk_size,
                       stereo=getattr(args, "stereo", False),
                       target_sr=getattr(args, "target_sr", None),
                       model_state=state.model_state)
    from ..train.latent_stats import load_latent_stats
    sr.set_latent_stats(load_latent_stats(args.run))
    out = sr.serialize(Path(args.run) / "export")
    print(f"exported streaming model to {out} "
          f"(delay {sr.total_delay_samples()} samples)")

    if getattr(args, "voice_conversion", False):
        if cfg.speaker_embedding_size == 0:
            raise SystemExit("--voice_conversion needs a speaker-"
                             "conditioned model (e.g. v2_fork)")
        from .voice_conversion import VoiceConverter
        wavs = list(getattr(args, "speaker_wavs", []) or [])
        table = (VoiceConverter.build_speaker_table(
            cfg, params, wavs, model_state=state.model_state)
                 if wavs else None)
        vc = VoiceConverter(cfg, params, chunk_size=args.chunk_size,
                            speaker_table=table,
                            model_state=state.model_state)
        vc.serialize(out)
        print(f"exported voice-conversion step to {out} "
              f"({len(vc.speaker_table)} speaker embeddings)")
