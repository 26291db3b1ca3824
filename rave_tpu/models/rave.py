"""RAVE model assembly: PQMF + encoder + latent head + generator.

TPU-native counterpart of reference ``rave/model.py:127-247`` (the
LightningModule's *model* half -- the training step lives in
:mod:`rave_tpu.train.loop` as a pure jitted function).  The module is
config-driven (see :class:`rave_tpu.config.RAVEConfig`) and builds either
architecture generation (v1/v2), any latent head, optional speaker
conditioning (the voice-conversion fork) and optional AdaIN/Snake/noise.

The same module definition serves offline training and streaming
inference: pass ``streaming=True`` to carry conv caches in the ``"cache"``
collection (reference flips a global ``cc.use_cached_conv`` before build,
``scripts/export.py:543``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..config import RAVEConfig
from ..ops.conv import StreamSetup
from ..ops.pqmf import PQMF
from .blocks import (EncoderV1, EncoderV2, GeneratorV1, GeneratorV2,
                     MelFrontEnd, mel_front_delay)
from .latent import (DiscreteHead, SphericalHead, VariationalHead,
                     WassersteinHead)
from .speaker import SpeakerRAVE


class CrossEntropyProjection(nn.Module):
    """Latent -> HuBERT discrete-unit logits (reference
    ``rave/model.py:113-123``): LayerNorm over time, 1x1 conv to
    ``units`` classes, linear-interp to ``target_frames``."""
    units: int = 100
    target_frames: int = 148  # reference model.py:123 (50 Hz units @ ~3 s)

    @nn.compact
    def __call__(self, z: jax.Array,
                 target_frames: Optional[int] = None) -> jax.Array:
        # z: (B, T, C). Reference LayerNorm(256) normalises the *time* dim
        # of the (B, C, T) tensor; we mirror that (normalise over T).
        zt = z.transpose(0, 2, 1)  # (B, C, T)
        zt = nn.LayerNorm(reduction_axes=-1)(zt)
        z = zt.transpose(0, 2, 1)
        logits = nn.Dense(self.units)(z)  # 1x1 conv over time == dense
        # F.interpolate(.., target_frames) on (B, units, T): nearest? the
        # reference uses default mode='nearest'.  target_frames follows
        # the unit provider's actual frame count (the reference hard-codes
        # its 131072 @ 44.1 kHz value); the default keeps parity.
        tf = self.target_frames if target_frames is None else target_frames
        if tf <= 0:
            raise ValueError(f"target_frames must be positive, got {tf} "
                             "(unit provider yielded an empty frame axis?)")
        B, T, U = logits.shape
        idx = jnp.clip((jnp.arange(tf) * T) // tf, 0, T - 1)
        return logits[:, idx, :]  # (B, tf, units)


def pqmf_in_delay(cfg: RAVEConfig) -> int:
    """Streaming delay of the encoder's input stream, in encoder-input
    frames: the PQMF analysis delay (band frames), or the mel front
    end's carried-context delay (mel frames) for hybrid configs.
    Only consulted by the streaming delay algebra (offline padding is
    unaffected by ``in_delay``)."""
    if cfg.use_mel_encoder:
        return mel_front_delay(cfg.mel_n_fft, cfg.mel_hop)
    if cfg.n_band > 1:
        from ..ops.pqmf import _pqmf_kernels
        _, pad_a, _, _ = _pqmf_kernels(cfg.pqmf_attenuation, cfg.n_band)
        return pad_a
    return 0


def make_encoder(cfg: RAVEConfig, ss: StreamSetup, train_mode: bool = True):
    """Single construction authority for the encoder -- used by
    ``RAVE.setup`` AND by the export delay computation so the two can
    never drift."""
    # the voice-conversion fork feeds the raw (un-reparametrised) latent
    # to the decoder and trains the encoder via CE only (reference
    # model.py:349,358-360; v1.gin sets n_out=1), so the variational
    # head's 2x channels only apply to the upstream path
    n_out = (2 if (cfg.latent_head == "variational"
                   and cfg.speaker_embedding_size == 0) else 1)
    data_size = (cfg.mel_n_mels if cfg.use_mel_encoder
                 else cfg.effective_encoder_data_size())
    enc_ratios = cfg.encoder_ratios or cfg.ratios
    enc_dilations = cfg.encoder_dilations or cfg.dilations
    if cfg.encoder_version == "v2":
        return EncoderV2(
            data_size=data_size, capacity=cfg.capacity,
            ratios=enc_ratios, latent_size=cfg.latent_size,
            n_out=n_out, kernel_size=cfg.kernel_size,
            dilations=enc_dilations, keep_dim=cfg.keep_dim,
            activation=cfg.activation, weight_norm=cfg.weight_norm,
            adain=cfg.adain, gru_layers=cfg.encoder_gru_layers,
            in_delay=pqmf_in_delay(cfg), fused=cfg.fused_kernels,
            train_mode=train_mode, ss=ss)
    return EncoderV1(
        data_size=data_size, capacity=cfg.capacity,
        latent_size=cfg.latent_size, ratios=cfg.ratios,
        n_out=n_out, sample_norm=cfg.v1_sample_norm,
        repeat_layers=cfg.v1_repeat_layers,
        train_mode=train_mode, ss=ss)


def make_decoder(cfg: RAVEConfig, ss: StreamSetup, train_mode: bool = True):
    """Single construction authority for the generator (see
    ``make_encoder``)."""
    dec_latent = cfg.decoder_latent_size()
    if cfg.generator_version == "v2":
        return GeneratorV2(
            data_size=cfg.n_band, capacity=cfg.capacity,
            ratios=cfg.ratios, latent_size=dec_latent,
            kernel_size=cfg.kernel_size, dilations=cfg.dilations,
            keep_dim=cfg.keep_dim,
            amplitude_modulation=cfg.amplitude_modulation,
            use_noise=cfg.use_noise, noise_ratios=cfg.noise_ratios,
            noise_bands=cfg.noise_bands, activation=cfg.activation,
            weight_norm=cfg.weight_norm, adain=cfg.adain,
            gru_layers=cfg.decoder_gru_layers,
            fused=cfg.fused_kernels,
            train_mode=train_mode, ss=ss)
    return GeneratorV1(
        latent_size=dec_latent, capacity=cfg.capacity,
        data_size=cfg.n_band, ratios=cfg.ratios,
        loud_stride=cfg.v1_loud_stride, use_noise=cfg.v1_use_noise,
        kernel_sizes=cfg.v1_kernel_sizes,
        dilations_list=cfg.v1_dilations_list,
        activation=cfg.activation, weight_norm=cfg.weight_norm,
        ss=ss)


def band_frame_delay(cfg: RAVEConfig, ss: StreamSetup) -> int:
    """Composite encoder+decoder streaming delay at the band rate:
    encoder latent-frame delay scaled through the decoder's upsamplers
    plus the decoder's own band-frame delay.

    The latent->band conversion uses the DECODER ratios: a latent stream
    delayed by ``d`` frames emerges from the upsamplers delayed by
    ``d * prod(decoder ratios)`` band frames.  (For PQMF configs the
    encoder ratios equal the decoder ratios so the distinction is
    invisible; hybrid's mel encoder has its own ratio chain.)"""
    enc = make_encoder(cfg, ss, train_mode=False)
    dec = make_decoder(cfg, ss, train_mode=False)
    dec_ratio_total = 1
    for r in cfg.ratios:
        dec_ratio_total *= r
    return enc.out_delay * dec_ratio_total + dec.out_delay


class RAVE(nn.Module):
    cfg: RAVEConfig
    streaming: bool = False
    train_mode: bool = True

    @property
    def ss(self) -> StreamSetup:
        return StreamSetup(mode="causal" if self.cfg.causal else "centered",
                           streaming=self.streaming)

    # ---------------- submodule builders (setup) ----------------------

    def setup(self):
        cfg = self.cfg
        ss = self.ss

        self.encoder = make_encoder(cfg, ss, self.train_mode)
        if cfg.use_mel_encoder:
            self.mel_frontend = MelFrontEnd(
                n_fft=cfg.mel_n_fft, hop=cfg.mel_hop,
                n_mels=cfg.mel_n_mels, sample_rate=cfg.sampling_rate,
                ss=ss)

        head = cfg.latent_head
        if head == "variational":
            self.latent = VariationalHead()
        elif head == "wasserstein":
            self.latent = WassersteinHead(
                noise_augmentation=cfg.noise_augmentation)
        elif head == "spherical":
            self.latent = SphericalHead()
        elif head == "discrete":
            self.latent = DiscreteHead(
                num_quantizers=cfg.num_quantizers,
                latent_size=cfg.latent_size,
                codebook_size=cfg.codebook_size,
                noise_augmentation=cfg.noise_augmentation)
        else:
            raise ValueError(f"unknown latent head {head!r}")

        self.decoder = make_decoder(cfg, ss, self.train_mode)

        # composite streaming delay at the band rate -- the single delay
        # authority; export/streaming.py reads band_frame_delay (same
        # builders) instead of re-deriving the chain
        self.band_delay = (band_frame_delay(cfg, ss) if ss.streaming
                           else 0)
        if cfg.n_band > 1:
            # synthesis-side frame parity: odd band-frame lag flips the
            # reverse_half mask (see ops/pqmf.py)
            self.pqmf = PQMF(attenuation=cfg.pqmf_attenuation,
                             n_band=cfg.n_band,
                             inverse_parity=self.band_delay % 2, ss=ss)
        else:
            self.pqmf = None

        if cfg.speaker_embedding_size > 0:
            # from-scratch speaker encoders use cohort-statistics
            # whitening with no stored stats (identical train/eval --
            # see models.speaker.CohortNorm); the pretrained-checkpoint
            # path keeps the reference's BatchNorm layout, frozen
            # running averages by default (reference model.py:351-353)
            norm = cfg.speaker_norm
            if norm == "auto":
                norm = "cohort" if cfg.train_speaker_encoder else "batch"
            if norm not in ("cohort", "batch"):
                raise ValueError(f"unknown speaker_norm {cfg.speaker_norm!r}")
            self.speaker_encoder = SpeakerRAVE(
                train_bn=(norm == "batch" and cfg.train_speaker_encoder
                          and self.train_mode),
                cohort_norm=(norm == "cohort"))
        else:
            self.speaker_encoder = None

        if cfg.hubert_units > 0:
            self.ce_projection = CrossEntropyProjection(units=cfg.hubert_units)
        else:
            self.ce_projection = None

        if cfg.speaker_embedding_size > 0 \
                and cfg.latent_adversary_weight > 0 \
                and cfg.speaker_classes > 0:
            # speaker-adversarial probe on the content latent
            # (cfg.latent_adversary_weight): small MLP over mean+std
            # pooled z, trained by CE with a reversed gradient into the
            # encoder.  The leading LayerNorm makes the probe
            # scale-invariant: without it the encoder "wins" by blowing
            # up z's scale instead of removing speaker information
            # (measured round 5: NaN blow-up within 1k steps of the GAN
            # phase engaging).
            self.latent_adversary = nn.Sequential([
                nn.LayerNorm(),
                nn.Dense(128), nn.relu, nn.Dense(cfg.speaker_classes)])
        else:
            self.latent_adversary = None

        if cfg.speaker_embedding_size > 0 and cfg.speaker_classes > 0:
            # from-scratch discriminative training of the speaker
            # embedding: AAM-softmax head over speaker ids (the VoxCeleb
            # pretraining the reference relies on, done in-run; see
            # RAVEConfig.speaker_classes and models.speaker.AAMSpeakerHead)
            from .speaker import AAMSpeakerHead
            self.speaker_classifier = AAMSpeakerHead(
                classes=cfg.speaker_classes)
        else:
            self.speaker_classifier = None

    # ---------------- functional pieces --------------------------------

    def pqmf_forward(self, x: jax.Array) -> jax.Array:
        """Audio (B, T, 1) -> bands (B, T/M, M)."""
        return self.pqmf(x) if self.pqmf is not None else x

    def pqmf_inverse(self, y: jax.Array) -> jax.Array:
        return self.pqmf.inverse(y) if self.pqmf is not None else y

    def encode_bands(self, bands: jax.Array) -> jax.Array:
        """Bands -> pre-regularisation latent (B, T', latent * n_out)."""
        ds = self.cfg.effective_encoder_data_size()
        return self.encoder(bands[..., :ds])

    def encoder_features(self, x: jax.Array, bands: jax.Array) -> jax.Array:
        """Encoder input: PQMF band slice, or the hybrid log1p mel
        spectrogram front end (reference ``EncoderV2.forward``,
        ``rave/blocks.py:591-596``) -- streaming-capable via
        :class:`~rave_tpu.models.blocks.MelFrontEnd`'s carried sample
        cache (exceeds the reference, which cannot stream hybrid)."""
        if not self.cfg.use_mel_encoder:
            ds = self.cfg.effective_encoder_data_size()
            return bands[..., :ds]
        return self.mel_frontend(x[..., 0])

    def _dtype(self):
        return jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" \
            else jnp.float32

    def encode_input(self, x: jax.Array, bands: jax.Array) -> jax.Array:
        """Neural trunk in the compute dtype (bf16 fast path keeps the MXU
        fed; PQMF and losses stay float32)."""
        feats = self.encoder_features(x, bands).astype(self._dtype())
        return self.encoder(feats).astype(jnp.float32)

    def speaker_embedding(self, bands: jax.Array) -> jax.Array:
        """Speaker embedding (B, 256).  Frozen by default (reference
        model.py:351-353 computes it under no_grad on a pretrained
        encoder); with ``cfg.train_speaker_encoder`` the gradient flows
        and the optimizer group includes it (the no-pretrained-weights
        fallback)."""
        emb = self.speaker_encoder(bands)
        if self.cfg.train_speaker_encoder:
            return emb
        return jax.lax.stop_gradient(emb)

    def adversary_logits(self, z: jax.Array) -> jax.Array:
        """Speaker logits from the content latent (B, T, C): mean+std
        pooled over time, then the adversary MLP
        (``cfg.latent_adversary_weight``)."""
        pooled = jnp.concatenate([jnp.mean(z, axis=1),
                                  jnp.std(z, axis=1)], axis=-1)
        return self.latent_adversary(pooled)

    def classify_speaker(self, emb: jax.Array,
                         labels: Optional[jax.Array] = None) -> jax.Array:
        """Speaker-id logits from the (B, 256) embedding (the auxiliary
        AAM-softmax objective; ``cfg.speaker_classes``).  With ``labels``
        the target-class margin is applied (training); without, plain
        scaled cosine logits (accuracy/eval)."""
        return self.speaker_classifier(emb, labels)

    def reparametrize(self, z, rng=None, train: bool = False, enabled=True):
        if isinstance(self.latent, DiscreteHead):
            return self.latent(z, rng, train=train, enabled=enabled)
        return self.latent(z, rng)

    def project_units(self, z: jax.Array,
                      target_frames: Optional[int] = None) -> jax.Array:
        return self.ce_projection(z, target_frames)

    def decode_bands(self, z: jax.Array,
                     rng: Optional[jax.Array] = None,
                     warmed_up=True) -> jax.Array:
        z = z.astype(self._dtype())
        if isinstance(self.decoder, GeneratorV1):
            y = self.decoder(z, rng, warmed_up=warmed_up)
        else:
            y = self.decoder(z, rng)
        return y.astype(jnp.float32)

    # ---------------- inference API ------------------------------------

    def encode(self, x: jax.Array, rng: Optional[jax.Array] = None):
        """Audio -> sampled/processed latent (reference model.py:594-622)."""
        bands = self.pqmf_forward(x)
        z = self.encode_input(x, bands)
        if isinstance(self.latent, VariationalHead) \
                and self.cfg.speaker_embedding_size == 0:
            mean, _ = VariationalHead.mean_scale(z)
            z = mean
        elif isinstance(self.latent, SphericalHead):
            z, _ = self.latent(z)
        elif isinstance(self.latent, DiscreteHead):
            z, _ = self.latent(z, train=False)
        if self.speaker_encoder is not None:
            emb = self.speaker_embedding(bands)
            emb = jnp.broadcast_to(emb[:, None, :],
                                   (z.shape[0], z.shape[1], emb.shape[-1]))
            z = jnp.concatenate([z, emb], axis=-1)
        z = self._append_pitch(z, x)
        return z

    def _append_pitch(self, z: jax.Array, x: jax.Array) -> jax.Array:
        """Optional normalised-f0 conditioning channels (the fork's
        myforward latent composition ``cat(z, emb, f0_norm)``,
        ``scripts/export.py:397``); per-utterance stats like
        ``extract_f0_median_std`` there (``export.py:349-354``)."""
        if self.cfg.pitch_embedding_size == 0:
            return z
        from ..ops.pitch import pitch_feature
        cfg = self.cfg
        feat = pitch_feature(x, z.shape[1], cfg.sampling_rate,
                             hop=cfg.pitch_hop, fmin=cfg.pitch_fmin,
                             fmax=cfg.pitch_fmax,
                             channels=cfg.pitch_embedding_size,
                             estimator=cfg.pitch_estimator,
                             fcpe_ckpt=cfg.pitch_ckpt)
        return jnp.concatenate([z, feat], axis=-1)

    def decode(self, z: jax.Array, rng: Optional[jax.Array] = None):
        cfg = self.cfg
        want = cfg.decoder_latent_size()
        if cfg.noise_augmentation and \
                z.shape[-1] == want - cfg.noise_augmentation:
            # latent from ``encode``/RVQ decode has no noise-augmentation
            # channels (the reference re-samples them at decode time,
            # scripts/export.py:503-517); insert fresh noise between the
            # latent and any trailing speaker/pitch channels so the
            # layout matches the training-time reparametrize output
            noise = jax.random.normal(
                self.make_rng("latent") if rng is None else rng,
                (*z.shape[:2], cfg.noise_augmentation), z.dtype)
            lat = cfg.latent_size
            z = jnp.concatenate([z[..., :lat], noise, z[..., lat:]], -1)
        y = self.decode_bands(z, rng)
        return self.pqmf_inverse(y)

    def encode_indices(self, x: jax.Array) -> jax.Array:
        """Audio -> RVQ stage indices (B, n_quantizers, T_z); the discrete
        head's compact user-facing latent (reference
        ``DiscreteScriptedRAVE.post_process_latent``,
        ``scripts/export.py:503-510``)."""
        if not isinstance(self.latent, DiscreteHead):
            raise ValueError("encode_indices requires latent_head=discrete")
        bands = self.pqmf_forward(x)
        z = self.encode_input(x, bands)
        return self.latent.encode(z)

    def decode_indices(self, idx: jax.Array,
                       rng: Optional[jax.Array] = None) -> jax.Array:
        """RVQ stage indices -> audio (reference
        ``DiscreteScriptedRAVE.pre_process_latent``,
        ``scripts/export.py:512-517``).  Noise-augmentation channels are
        re-sampled like the reference does at decode time."""
        if not isinstance(self.latent, DiscreteHead):
            raise ValueError("decode_indices requires latent_head=discrete")
        z = self.latent.decode(idx)
        return self.decode(z, rng)  # decode re-samples the noise channels

    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None):
        return self.decode(self.encode(x, rng), rng)

    def warmup(self, x: jax.Array):
        """Exercise every parameterised path once -- used by init so all
        params exist (``__call__`` alone skips the CE projection and the
        training-only reparametrisation)."""
        y = self(x)
        bands = self.pqmf_forward(x)
        z = self.encode_input(x, bands)
        if self.ce_projection is not None:
            _ = self.project_units(z)
        if self.speaker_classifier is not None:
            _ = self.classify_speaker(self.speaker_embedding(bands))
        if self.latent_adversary is not None:
            _ = self.adversary_logits(z)
        _ = self.reparametrize(z, train=False)
        return y

    # voice conversion: encode source content, condition on target timbre
    def convert(self, x: jax.Array, target: jax.Array,
                rng: Optional[jax.Array] = None):
        """Reference validation conversion path (model.py:713-731)."""
        bands = self.pqmf_forward(x)
        z = self.encode_input(x, bands)
        if isinstance(self.latent, VariationalHead) \
                and self.cfg.speaker_embedding_size == 0:
            z, _ = VariationalHead.mean_scale(z)
        # Enrollment cohort: embed source and target segments JOINTLY and
        # average the target's.  The from-scratch (CohortNorm) speaker
        # encoder whitens the pooled statistics across the batch
        # (models/speaker.py bn5), so a single-item batch returns the
        # same constant (the norm's bias through the affine fc6) for
        # EVERY speaker -- and a same-speaker segment cohort mean-pools
        # back to that constant too, because centering removes exactly
        # the cohort mean and fc6 commutes with the average.  A cohort
        # spanning BOTH clips keeps the target-vs-source identity
        # direction in the whitened embedding -- precisely the direction
        # conversion conditions on.  For batch/running-stat encoders
        # (the reference's pretrained ECAPA) joint embedding is a no-op
        # and segment averaging is the standard enrollment recipe.
        B = target.shape[0]
        T = min(x.shape[1], target.shape[1])
        segs = 4 if T >= 4 * 32768 else 2
        seg_len = (T // segs)

        def _chunks(a):
            return a[:, : segs * seg_len].reshape(
                B * segs, seg_len, a.shape[-1])

        cohort = jnp.concatenate([_chunks(x), _chunks(target)], axis=0)
        emb_all = self.speaker_embedding(self.pqmf_forward(cohort))
        emb = jnp.mean(emb_all.reshape(2, B, segs, -1)[1], axis=1)
        emb = jnp.broadcast_to(emb[:, None, :],
                               (z.shape[0], z.shape[1], emb.shape[-1]))
        z = jnp.concatenate([z, emb], axis=-1)
        z = self._append_pitch(z, x)  # source prosody, target timbre
        return self.decode(z, rng)
