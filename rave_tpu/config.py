"""Layered configuration system -- the gin replacement.

The reference composes 15 ``.gin`` files by include + override
(``rave/configs/*.gin``; parsed at ``scripts/train.py:115-118``) with
orthogonal toggles (``causal.gin``, ``snake.gin``, ``adain.gin``,
``noise.gin``, discriminator/regularizer choices).  Here the same
composition algebra is a registry of *preset transforms* applied in order
to one typed dataclass, plus ``key=value`` CLI overrides and an operative
config hash for run identity (reference ``scripts/train.py:163-168``).

``build_config(["v2", "causal"], ["capacity=32"])`` mirrors
``rave train --config v2 --config causal --override CAPACITY=32``.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence


@dataclass
class DiscriminatorConfig:
    kind: str = "combine"             # see models.discriminators.DISCRIMINATORS
    members: tuple = ("periods", "scales", "spectral")
    # per-member loss weights (reference fork weighs the MelGAN stack at
    # 0.1 next to UnivNet, model.py:518-519); None -> all 1.0
    member_weights: Optional[tuple] = None
    capacity: int = 64
    n_layers: int = 4
    periods: tuple = (2, 3, 5, 7, 11)
    fft_sizes: tuple = (2048, 1024, 512)
    # Encodec spectral-disc STFT scales ("spectral" member); every scale
    # must be <= the (cropped) training signal length
    spectral_scales: tuple = (4096, 2048, 1024, 512, 256)


@dataclass
class RAVEConfig:
    # identity
    name: str = "v2"
    sampling_rate: int = 44100

    # pqmf (reference configs/v1.gin:37-39)
    n_band: int = 16
    pqmf_attenuation: float = 100.0

    # architecture
    encoder_version: str = "v2"       # "v1" | "v2"
    generator_version: str = "v2"     # "v1" | "v2"
    capacity: int = 64
    latent_size: int = 64
    ratios: tuple = (4, 4, 2, 2)
    kernel_size: int = 3
    dilations: tuple = ((1, 3, 9), (1, 3, 9), (1, 3, 9), (1, 3))
    keep_dim: bool = False
    activation: str = "leaky_relu"    # snake.gin -> "snake"
    weight_norm: bool = True          # blocks.normalization mode (v1.gin:41)
    adain: bool = False               # adain.gin
    causal: bool = False              # causal.gin
    amplitude_modulation: bool = True  # v2.gin GeneratorV2
    use_noise: bool = False           # noise.gin -> NoiseGeneratorV2
    noise_ratios: tuple = (2, 2, 2)
    noise_bands: int = 5

    # v1 specifics
    v1_loud_stride: int = 1
    v1_use_noise: bool = True
    v1_sample_norm: bool = False
    v1_repeat_layers: int = 1
    v1_kernel_sizes: tuple = (3,)
    v1_dilations_list: tuple = ((1, 1), (3, 1), (5, 1))

    # which PQMF bands feed the encoder (the voice-conversion fork encodes
    # only the first 6 of 16 bands, reference model.py:341; upstream uses
    # all bands). None -> all bands.
    encoder_data_size: Optional[int] = None

    # hybrid: mel-spectrogram encoder front end + recurrent layers
    # (reference configs/hybrid.gin; note the reference's hybrid is marked
    # "NOT READY" in its test matrix -- here the rates are made consistent:
    # mel_hop * prod(encoder_ratios) == n_band * prod(ratios))
    use_mel_encoder: bool = False
    mel_n_fft: int = 2048
    mel_n_mels: int = 128
    mel_hop: int = 128
    encoder_ratios: Optional[tuple] = None   # defaults to ratios
    encoder_dilations: Optional[tuple] = None
    encoder_gru_layers: int = 0
    decoder_gru_layers: int = 0

    # latent head
    latent_head: str = "variational"  # variational|wasserstein|spherical|discrete
    noise_augmentation: int = 0
    num_quantizers: int = 16
    codebook_size: int = 1024

    # conditioning (voice conversion fork)
    speaker_embedding_size: int = 0   # 256 in the fork (configs/v2.gin)
    hubert_units: int = 0             # 100 discrete HuBERT units (model.py:117)
    # perturb the encoder input (formant/pitch shift + EQ [+ noise via
    # --noise_path]) so it learns speaker-invariant content -- the fork's
    # central training mechanism (reference rave/dataset.py:258-289
    # returning (clean, perturbed, speaker); encoder consumes the
    # perturbed view, model.py:340-343)
    perturb_inputs: bool = False
    # train the speaker encoder alongside the content encoder instead of
    # freezing it -- the fallback when no VoxCeleb-pretrained checkpoint
    # is available (the reference always freezes a pretrained one,
    # model.py:165-174; see `rave-tpu train --speaker_ckpt`)
    train_speaker_encoder: bool = False
    # >0 trains a speaker-adversarial classifier on the (detached-for-
    # the-decoder) content latent with gradient reversal at this weight:
    # the classifier learns to read the speaker from z while the encoder
    # is pushed to erase it.  EXCEEDS the reference, which relies on
    # ~1M-step perturbation training for the same disentanglement
    # (round-5 measurement: at 16k steps the decoder still resynthesizes
    # the source timbre from residual register cues in z; the adversary
    # removes them in a few k steps).  0 = off (reference behavior).
    latent_adversary_weight: float = 0.0
    # speaker-encoder normalization: "auto" = cohort-statistics
    # whitening with no stored stats (train==eval; embeddings depend on
    # the batch/cohort) when training from scratch, BatchNorm (the
    # reference's VoxCeleb-checkpoint layout) otherwise; force "batch"
    # to fine-tune a pretrained checkpoint with
    # train_speaker_encoder=true, or "cohort"/"batch" to pin
    # explicitly.  See models/speaker.py:CohortNorm for the measured
    # round-5 failure modes this resolves.
    speaker_norm: str = "auto"
    # >0 adds a linear speaker-classification head on the 256-d speaker
    # embedding trained by CE over the dataset's speaker ids.  The
    # reference gets a discriminative embedding for free from VoxCeleb
    # pretraining (AAM-softmax classification, the ECAPA recipe); this is
    # the from-scratch equivalent so `train_speaker_encoder=true` runs
    # still learn SEPARATED speaker clusters instead of a degenerate
    # embedding (round-4 finding: without it, spk-cosine streams sit at
    # ~1.0 for every speaker pair).  Set to the corpus speaker count.
    speaker_classes: int = 0
    # pitch conditioning: normalised-f0 channels appended to the decoder
    # latent (the fork's myforward surface, scripts/export.py:349-397;
    # core.get_augmented_latent_size's pitch_embedding_size arg,
    # core.py:78-79).  1 = continuous whitening-normalised log-f0.
    pitch_embedding_size: int = 0
    pitch_hop: int = 1024             # f0 frame hop (export.py:352: 1024)
    pitch_fmin: float = 50.0          # FCPE bounds (pitch_utils.py:139-140)
    pitch_fmax: float = 550.0
    # f0 estimator: "fcpe" = the reference's neural pitch model
    # (rave/pitch_utils.py:133-143, torchfcpe) converted to JAX
    # (models/pitch_fcpe.py) -- needs pitch_ckpt, else falls back to the
    # in-graph YIN with a warning; "yin" = in-graph YIN always
    pitch_estimator: str = "fcpe"
    pitch_ckpt: str = ""              # torchfcpe checkpoint path

    # discriminator + GAN
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    gan_loss: str = "hinge"           # hinge|ls|nonsaturating
    feature_matching_norm: str = "L1"
    feature_matching_relative: bool = False
    num_skipped_features: int = 0
    weights: dict = field(default_factory=lambda: {"feature_matching": 10.0})

    # training schedule (reference model.py:50-111, configs)
    phase_1_duration: int = 100_000
    warmup_quantize: Optional[int] = None
    update_discriminator_every: int = 2
    beta_initial: float = 0.1
    beta_target: float = 0.1
    beta_warmup_len: int = 1
    valid_signal_crop: bool = False

    # audio distances
    stft_scales: tuple = (2048, 1024, 512, 256, 128)
    log_epsilon: float = 1e-7
    mr_stft_specs_ms: tuple = ((5, 25), (10, 50), (2, 10))
    mr_stft_weight: float = 2.5       # fork: model.py:391

    # loss selection: "rave" (upstream multiband+fullband distances) or
    # "mrstft" (the fork's MultiResolutionSTFTLoss path, model.py:389-393)
    recon_loss: str = "rave"

    # optimisation
    ema_decay: Optional[float] = None  # reference scripts/train.py EMA cb
    learning_rate: float = 1e-4
    # separate LR for the from-scratch speaker encoder + AAM head.
    # None -> learning_rate.  Measured round 5: with cohort-norm
    # whitening, 1e-4 converges the AAM objective fast (accuracy ~1.0
    # within ~1k steps on an 8-speaker corpus) while 1e-3 oscillates
    # and never separates -- the ECAPA-recipe 1e-3 assumes large-corpus
    # BatchNorm training, not this whitened micro-corpus regime.
    speaker_learning_rate: Optional[float] = None
    adam_b1: float = 0.5
    adam_b2: float = 0.9
    batch_size: int = 8
    n_signal: int = 131072
    max_steps: int = 6_000_000

    # numerics
    compute_dtype: str = "float32"    # "bfloat16" for the fast path
    fused_kernels: bool = False       # Pallas fused dilated units (TPU)

    def effective_encoder_data_size(self) -> int:
        return self.encoder_data_size or self.n_band

    def decoder_latent_size(self) -> int:
        """Latent fed to the generator = latent + noise aug + speaker emb
        (reference ``core.get_augmented_latent_size``, ``core.py:78-79``)."""
        return (self.latent_size + self.noise_augmentation
                + self.speaker_embedding_size + self.pitch_embedding_size)

    def total_ratio(self) -> int:
        r = self.n_band
        for x in self.ratios:
            r *= x
        return r

    # run-level knobs excluded from run identity -- in the reference these
    # are absl flags, not gin config (scripts/train.py:34-48), so changing
    # them must not change the run hash (else --resume silently forks a
    # fresh run dir)
    # pitch_ckpt is a host path to frozen weights: same weights live at
    # different paths across machines, so it must not fork the run hash
    _RUN_LEVEL_FIELDS = ("max_steps", "batch_size", "n_signal",
                         "pitch_ckpt")

    def hash(self) -> str:
        d = dataclasses.asdict(self)
        for k in self._RUN_LEVEL_FIELDS:
            d.pop(k, None)
        blob = json.dumps(d, sort_keys=True, default=str)
        return hashlib.md5(blob.encode()).hexdigest()[:10]


# ---------------------------------------------------------------------
# Preset registry (mirrors rave/configs/*.gin)
# ---------------------------------------------------------------------

PRESETS: dict[str, Callable[[RAVEConfig], None]] = {}


def preset(name: str):
    def deco(fn):
        PRESETS[name] = fn
        return fn
    return deco


@preset("v1")
def _v1(c: RAVEConfig):
    """configs/v1.gin"""
    c.name = "v1"
    c.encoder_version = "v1"
    c.generator_version = "v1"
    c.capacity = 64
    c.latent_size = 64
    c.ratios = (4, 2, 2, 2)
    c.phase_1_duration = 100_000
    c.latent_head = "variational"
    c.gan_loss = "hinge"
    c.discriminator = DiscriminatorConfig(kind="multi_scale")
    c.weights = {"feature_matching": 10.0}
    c.beta_initial = c.beta_target = 0.1
    c.beta_warmup_len = 1
    c.valid_signal_crop = False
    c.recon_loss = "rave"


@preset("v2")
def _v2(c: RAVEConfig):
    """configs/v2.gin (on top of v1)"""
    _v1(c)
    c.name = "v2"
    c.encoder_version = "v2"
    c.generator_version = "v2"
    c.ratios = (4, 4, 2, 2)
    c.kernel_size = 3
    c.dilations = ((1, 3, 9), (1, 3, 9), (1, 3, 9), (1, 3))
    c.amplitude_modulation = True
    c.discriminator = DiscriminatorConfig(
        kind="combine", members=("periods", "scales", "spectral"))
    c.feature_matching_relative = True
    c.num_skipped_features = 1
    c.update_discriminator_every = 4
    c.weights = {"feature_matching": 20.0}
    c.beta_initial = c.beta_target = 0.02
    c.valid_signal_crop = True


@preset("v2_fork")
def _v2_fork(c: RAVEConfig):
    """The voice-conversion fork's operative v2: 6-band encoder input,
    256-dim speaker conditioning, HuBERT CE loss, UnivNet+MelGAN
    discriminators, MR-STFT reconstruction (reference model.py:182-198)."""
    _v2(c)
    c.name = "v2_fork"
    c.encoder_data_size = 6
    c.speaker_embedding_size = 256
    c.hubert_units = 100
    c.perturb_inputs = True
    c.recon_loss = "mrstft"
    c.discriminator = DiscriminatorConfig(
        kind="combine", members=("univnet", "melgan_stack"),
        member_weights=(1.0, 0.1))
    c.gan_loss = "ls"


@preset("v3")
def _v3(c: RAVEConfig):
    """configs/v3.gin = v2 + adain + snake + descript discriminator"""
    _v2(c)
    c.name = "v3"
    c.adain = True
    c.activation = "snake"
    c.discriminator = DiscriminatorConfig(kind="descript")
    c.beta_initial = 1e-6
    c.beta_target = 5e-2
    c.beta_warmup_len = 20000


@preset("discrete")
def _discrete(c: RAVEConfig):
    """configs/discrete.gin"""
    _v2(c)
    c.name = "discrete"
    c.latent_head = "discrete"
    c.num_quantizers = 16
    c.latent_size = 128
    c.codebook_size = 1024
    c.capacity = 96
    c.phase_1_duration = 50_000
    c.warmup_quantize = -1
    c.log_epsilon = 1.0
    c.num_skipped_features = 0
    c.update_discriminator_every = 4
    c.beta_initial = c.beta_target = 0.1
    c.beta_warmup_len = 1


@preset("discrete_v3")
def _discrete_v3(c: RAVEConfig):
    """configs/discrete_v3.gin"""
    _discrete(c)
    c.name = "discrete_v3"
    c.activation = "snake"
    c.discriminator = DiscriminatorConfig(kind="descript")
    c.beta_initial = 1e-6
    c.beta_target = 5e-2
    c.beta_warmup_len = 20000


@preset("wasserstein")
def _wasserstein(c: RAVEConfig):
    """configs/wasserstein.gin"""
    c.name = "wasserstein"
    c.latent_head = "wasserstein"
    c.latent_size = 16
    c.noise_augmentation = 128
    c.phase_1_duration = 200_000
    c.weights = {"fullband_spectral_distance": 2.0,
                 "multiband_spectral_distance": 2.0,
                 "adversarial": 2.0}
    c.beta_initial = c.beta_target = 100.0
    c.beta_warmup_len = 1


@preset("spherical")
def _spherical(c: RAVEConfig):
    """configs/spherical.gin"""
    c.name = "spherical"
    c.latent_head = "spherical"
    c.latent_size = 16
    c.phase_1_duration = 200_000


@preset("onnx")
def _onnx(c: RAVEConfig):
    """configs/onnx.gin: v1 at capacity 32, no noise branch"""
    _v1(c)
    c.name = "onnx"
    c.capacity = 32
    c.v1_use_noise = False


@preset("raspberry")
def _raspberry(c: RAVEConfig):
    """configs/raspberry.gin: onnx at capacity 16"""
    _onnx(c)
    c.name = "raspberry"
    c.capacity = 16


@preset("hybrid")
def _hybrid(c: RAVEConfig):
    """configs/hybrid.gin: mel front end + GRU decoder."""
    _v2(c)
    c.name = "hybrid"
    c.use_mel_encoder = True
    c.mel_n_fft = 2048
    c.mel_n_mels = 128
    c.mel_hop = 128
    c.encoder_ratios = (2, 2, 2)
    c.encoder_dilations = ((1,), (1,), (1,))
    c.decoder_gru_layers = 2


# -- orthogonal toggles ------------------------------------------------

@preset("causal")
def _causal(c: RAVEConfig):
    c.causal = True


@preset("snake")
def _snake(c: RAVEConfig):
    c.activation = "snake"


@preset("adain")
def _adain(c: RAVEConfig):
    c.adain = True


@preset("noise")
def _noise(c: RAVEConfig):
    c.use_noise = True
    c.noise_ratios = (2, 2, 2)
    c.noise_bands = 5


@preset("pitch")
def _pitch(c: RAVEConfig):
    """f0-conditioned decoder (the fork's myforward composition,
    ``scripts/export.py:349-397``, restored as a first-class option)."""
    c.pitch_embedding_size = 1


@preset("descript_discriminator")
def _descript_d(c: RAVEConfig):
    c.discriminator = DiscriminatorConfig(kind="descript")


@preset("spectral_discriminator")
def _spectral_d(c: RAVEConfig):
    c.discriminator = DiscriminatorConfig(
        kind="combine", members=("scales", "spectral"),
        capacity=32)


def _parse_value(s: str) -> Any:
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        return s


def build_config(names: Sequence[str],
                 overrides: Sequence[str] = ()) -> RAVEConfig:
    """Compose presets in order, then apply ``key=value`` overrides."""
    cfg = RAVEConfig()
    for n in names:
        key = n.removesuffix(".gin")
        if key not in PRESETS:
            raise KeyError(f"unknown config preset {key!r}; "
                           f"available: {sorted(PRESETS)}")
        PRESETS[key](cfg)
    for ov in overrides:
        k, _, v = ov.partition("=")
        k = k.strip()
        target = cfg
        if "." in k:  # dotted path, e.g. discriminator.kind=multi_scale
            head, k = k.rsplit(".", 1)
            for part in head.split("."):
                target = getattr(target, part)
        if not hasattr(target, k):
            raise KeyError(f"unknown config field {k!r}")
        val = _parse_value(v.strip())
        if isinstance(getattr(target, k), tuple) and isinstance(val, list):
            val = tuple(val)
        setattr(target, k, val)
    # zero-flag asset discovery: a host that HAS the frozen FCPE teacher
    # exports RAVE_TPU_FCPE_CKPT and everything (training, serving,
    # speaker stats, gated tests) picks it up without --override
    # (pitch_ckpt is excluded from the run hash, so this cannot fork
    # run identity across machines)
    if not cfg.pitch_ckpt:
        import os
        env = os.environ.get("RAVE_TPU_FCPE_CKPT", "")
        if env:
            # loud: the estimator choice (FCPE vs YIN fallback) now
            # depends on the environment, and pitch_ckpt is excluded
            # from the run hash -- resuming on a host WITHOUT the var
            # would silently switch the f0 front end to YIN
            print(f"pitch_ckpt <- $RAVE_TPU_FCPE_CKPT ({env}); keep the "
                  "variable set on every host that touches this run, or "
                  "pass --override pitch_ckpt=... explicitly")
            cfg.pitch_ckpt = env
    return cfg
