"""Jitted RAVE training step.

Re-design of the reference's manual-optimisation Lightning step
(``rave/model.py:301-592``) as ONE pure jitted function:

* three Adam groups -- encoder(+latent+CE-projection), decoder,
  discriminators (reference ``configure_optimizers``, model.py:249-264),
* branchless two-phase schedule: ``warmed_up`` and the D-vs-G alternation
  are ``lax.cond`` branches on the carried step counter, so phase-1 steps
  never pay for discriminator compute,
* both reconstruction-loss paths: the upstream RAVE multiband+fullband
  spectral distances and the fork's MR-STFT criterion
  (model.py:386-393), selected statically by config,
* RVQ EMA codebook state threaded through the step (``"quantizer"``
  collection),
* data parallelism by GSPMD: params replicated, batch sharded on axis 0 --
  XLA inserts the gradient all-reduces over ICI (no hand-written
  collectives needed; see ``rave_tpu.parallel``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import freeze, unfreeze

from ..config import RAVEConfig
from ..models.discriminators import (CombineDiscriminators, DISCRIMINATORS,
                                     DescriptDiscriminator,
                                     member_sub_count)
from ..models.rave import RAVE
from ..ops import losses as L
from . import schedules

ENC_GROUP = ("encoder", "latent", "ce_projection")
DEC_GROUP = ("decoder",)
FROZEN_GROUP = ("speaker_encoder",)


def _spk_group(cfg: RAVEConfig) -> tuple:
    """The speaker optimizer group: the from-scratch speaker encoder
    (cfg.train_speaker_encoder -- frozen otherwise, the reference's
    pretrained default) and the AAM classification head
    (cfg.speaker_classes).  Runs at ``cfg.speaker_learning_rate`` (the
    ECAPA-recipe ~1e-3) instead of the generator LR."""
    g = ()
    if cfg.speaker_embedding_size > 0 and cfg.speaker_classes > 0:
        g = g + ("speaker_classifier",)
        if cfg.latent_adversary_weight > 0:
            g = g + ("latent_adversary",)
    if cfg.train_speaker_encoder:
        g = g + FROZEN_GROUP
    return g


def _enc_group(cfg: RAVEConfig) -> tuple:
    """The encoder optimizer group (encoder + latent head + CE
    projection; speaker modules train in their own group)."""
    return ENC_GROUP


class TrainState(struct.PyTreeNode):
    step: jax.Array
    gen_params: Any
    dis_params: Any
    model_state: Any          # quantizer EMA, batch_stats, ...
    enc_opt: Any
    dec_opt: Any
    dis_opt: Any
    ema_params: Optional[Any] = None
    spk_opt: Optional[Any] = None   # speaker encoder + AAM head group


def build_discriminator(cfg: RAVEConfig):
    d = cfg.discriminator
    if d.kind == "combine":
        return CombineDiscriminators(members=tuple(d.members),
                                     capacity=d.capacity,
                                     spectral_scales=tuple(d.spectral_scales))
    if d.kind == "descript":
        return DescriptDiscriminator(periods=tuple(d.periods),
                                     fft_sizes=tuple(d.fft_sizes))
    if d.kind == "multi_scale":
        return DISCRIMINATORS[d.kind](capacity=d.capacity,
                                      n_layers=d.n_layers)
    cls = DISCRIMINATORS[d.kind]
    return cls()


def make_optimizers(cfg: RAVEConfig):
    tx = lambda lr: optax.adam(lr, b1=cfg.adam_b1, b2=cfg.adam_b2)
    spk_lr = cfg.speaker_learning_rate or cfg.learning_rate
    return tx(cfg.learning_rate), tx(cfg.learning_rate), \
        tx(cfg.learning_rate), tx(spk_lr)


def _split_groups(params, enc_group=ENC_GROUP, spk_group=()):
    enc = {k: v for k, v in params.items() if k in enc_group}
    dec = {k: v for k, v in params.items() if k in DEC_GROUP}
    spk = {k: v for k, v in params.items() if k in spk_group}
    rest = {k: v for k, v in params.items()
            if k not in enc_group and k not in DEC_GROUP
            and k not in spk_group}
    return enc, dec, spk, rest


def init_state(cfg: RAVEConfig, rng: jax.Array,
               batch_size: Optional[int] = None) -> TrainState:
    model = RAVE(cfg=cfg)
    disc = build_discriminator(cfg)
    B = batch_size or cfg.batch_size
    x = jnp.zeros((B, cfg.n_signal, 1), jnp.float32)
    r = jax.random.split(rng, 6)
    rngs = {"params": r[0], "latent": r[1], "noise": r[2], "quantizer": r[3]}
    # jit the inits: eager init dispatches one tiny XLA program per
    # parameter, which is pathological under remote-compile backends.
    # init through ``warmup`` so every parameterised path materialises.
    gen_vars = jax.jit(
        lambda r, xx: model.init(r, xx, method=RAVE.warmup))(rngs, x)
    gen_params = unfreeze(gen_vars["params"])
    model_state = {k: unfreeze(v) for k, v in gen_vars.items()
                   if k not in ("params", "cache")}
    dis_vars = jax.jit(disc.init)({"params": r[4]}, x)
    dis_params = unfreeze(dis_vars["params"])

    enc_tx, dec_tx, dis_tx, spk_tx = make_optimizers(cfg)
    enc, dec, spk, _ = _split_groups(gen_params, _enc_group(cfg),
                                     _spk_group(cfg))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        dis_params=dis_params,
        model_state=model_state,
        enc_opt=enc_tx.init(enc),
        dec_opt=dec_tx.init(dec),
        dis_opt=dis_tx.init(dis_params),
        ema_params=(jax.tree.map(jnp.copy, gen_params)
                    if cfg.ema_decay else None),
        spk_opt=spk_tx.init(spk) if spk else None,
    )


# ----------------------------------------------------------------------
# loss computation
# ----------------------------------------------------------------------

def _feature_matching(cfg, feats_real, feats_fake):
    """Reference model.py:429-438."""
    total = jnp.float32(0.0)
    skip = cfg.num_skipped_features
    for fr, ff in zip(feats_real, feats_fake):
        fr, ff = fr[skip:], ff[skip:]
        if not fr:
            continue
        d = jnp.float32(0.0)
        for a, b in zip(fr, ff):
            d = d + L.mean_difference(a, b, cfg.feature_matching_norm,
                                      cfg.feature_matching_relative)
        total = total + d / len(fr)
    return total


def _sub_weights(cfg) -> Optional[list]:
    d = cfg.discriminator
    if d.kind != "combine" or d.member_weights is None:
        return None
    w = []
    for m, mw in zip(d.members, d.member_weights):
        w.extend([float(mw)] * member_sub_count(m, d))
    return w


def _gan_terms(cfg, disc, dis_params, x, y):
    """Returns (loss_dis, loss_adv, feature_matching).

    Implements both the upstream path (feature matching + gan_loss on
    scores, model.py:417-448 commented-in upstream) and the fork's path
    (UnivNet LSGAN + 0.1 * MelGAN hinge via member_weights,
    model.py:461-519) through the same interface.
    """
    gan = L.GAN_LOSSES[cfg.gan_loss]
    # run both discriminator passes in the compute dtype: the real-audio
    # side otherwise stays f32 (batch dtype) and costs ~2x on the MXU.
    # Real + fake ride ONE batched pass (2B) -- identical math (no batch
    # coupling in any discriminator), but half the op count and double
    # the per-conv batch on the small-K spectral chains, which are
    # occupancy- not FLOP-limited at B=8.
    cdt = jnp.dtype(cfg.compute_dtype)
    B = x.shape[0]
    both = jnp.concatenate([x.astype(cdt), y.astype(cdt)], axis=0)
    feats_both = disc.apply({"params": dis_params}, both)

    def _take(f, sl):
        # feature maps are arrays or packed spectral maps (batch-first
        # either way)
        from ..models.discriminators import PackedFeature
        if isinstance(f, PackedFeature):
            return f.replace(data=f.data[sl])
        return f[sl]

    feats_real = [[_take(f, slice(None, B)) for f in chain]
                  for chain in feats_both]
    feats_fake = [[_take(f, slice(B, None)) for f in chain]
                  for chain in feats_both]
    weights = _sub_weights(cfg)
    loss_dis = jnp.float32(0.0)
    loss_adv = jnp.float32(0.0)
    for i, (fr, ff) in enumerate(zip(feats_real, feats_fake)):
        _dis, _adv = gan(fr[-1].astype(jnp.float32),
                         ff[-1].astype(jnp.float32))
        w = weights[i] if weights is not None else 1.0
        loss_dis = loss_dis + w * _dis
        loss_adv = loss_adv + w * _adv
    fm = _feature_matching(cfg, feats_real, feats_fake)
    return loss_dis, loss_adv, fm


def unit_ce_terms(model, variables, z_pre, units, num_units):
    """Discrete-unit CE loss + accuracy from the latent projection --
    ONE definition shared by the train step (the fork's CE objective,
    reference model.py:345-347) and the eval metrics, so they can never
    diverge.  The projection interpolates to the unit provider's actual
    frame count (the reference hard-codes 148 for its 131072-sample
    clips, model.py:123)."""
    logits = model.apply(variables, z_pre, units.shape[1],
                         method=RAVE.project_units)
    oh = jax.nn.one_hot(units, num_units)
    ce = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * oh, axis=-1))
    acc = jnp.mean((jnp.argmax(logits, -1) == units).astype(jnp.float32))
    return ce, acc


def _forward_losses(cfg: RAVEConfig, model: RAVE, disc, gen_params,
                    dis_params, model_state, batch, rng, step):
    """Full generator-side forward producing every loss term + aux."""
    x = batch["x"]
    x_p = batch.get("x_perturbed", x)
    r = jax.random.split(rng, 4)
    rngs = {"latent": r[0], "noise": r[1], "quantizer": r[2]}

    variables = {"params": gen_params, **model_state}
    mutable = [k for k in model_state.keys()]

    bands_x = model.apply(variables, x, method=RAVE.pqmf_forward)
    bands_xp = model.apply(variables, x_p, method=RAVE.pqmf_forward)
    new_state = model_state
    if "batch_stats" in model_state and cfg.encoder_version == "v1" \
            and not cfg.v1_sample_norm:
        # EncoderV1 BatchNorm: training updates the running statistics
        # (reference nn.BatchNorm1d, blocks.py:445,461); thread the new
        # stats into this step's output state and downstream applies
        z_pre, enc_state = model.apply(
            variables, x_p, bands_xp, method=RAVE.encode_input,
            rngs=rngs, mutable=["batch_stats"])
        new_state = {**model_state,
                     "batch_stats": unfreeze(enc_state["batch_stats"])}
        variables = {"params": gen_params, **new_state}
    else:
        z_pre = model.apply(variables, x_p, bands_xp,
                            method=RAVE.encode_input, rngs=rngs)

    aux = {}

    # CE loss against HuBERT units (fork path, model.py:345-347)
    ce_loss = jnp.float32(0.0)
    if cfg.hubert_units > 0 and "units" in batch:
        ce_loss, _ = unit_ce_terms(model, variables, z_pre,
                                   batch["units"], cfg.hubert_units)

    # latent regularisation
    if cfg.speaker_embedding_size > 0:
        # fork: decoder sees detached latent; encoder trains via CE only
        # (model.py:358-360)
        z = z_pre
        reg = jnp.float32(0.0)
        z_dec = jax.lax.stop_gradient(z)
        if cfg.train_speaker_encoder and "batch_stats" in new_state:
            # training-mode speaker BNs update running stats (see
            # SpeakerRAVE.train_bn)
            emb, spk_state = model.apply(
                variables, bands_x, method=RAVE.speaker_embedding,
                mutable=["batch_stats"])
            new_state = {**new_state,
                         "batch_stats": unfreeze(spk_state["batch_stats"])}
            variables = {"params": gen_params, **new_state}
        else:
            emb = model.apply(variables, bands_x,
                              method=RAVE.speaker_embedding)
        if cfg.speaker_classes > 0 and "speaker" in batch:
            # auxiliary AAM-softmax speaker-id CE on the pooled embedding
            # (see RAVEConfig.speaker_classes): separates the
            # from-scratch embeddings in COSINE (which conditions the
            # decoder and judges conversion), standing in for the
            # reference's VoxCeleb-pretrained encoder (model.py:165-174)
            logits = model.apply(variables, emb, batch["speaker"],
                                 method=RAVE.classify_speaker)
            oh = jax.nn.one_hot(batch["speaker"], cfg.speaker_classes)
            aux["spk_ce"] = -jnp.mean(jnp.sum(
                jax.nn.log_softmax(logits.astype(jnp.float32)) * oh, -1))
            # accuracy from the margin-free cosine logits
            plain = model.apply(variables, emb,
                                method=RAVE.classify_speaker)
            aux["spk_acc"] = jnp.mean(
                (jnp.argmax(plain, -1) == batch["speaker"]).astype(
                    jnp.float32))
        if cfg.latent_adversary_weight > 0 and cfg.speaker_classes > 0 \
                and "speaker" in batch:
            # speaker-adversarial disentanglement of the content latent
            # (RAVEConfig.latent_adversary_weight): gradient reversal --
            # forward is z, backward scales the encoder's gradient by
            # -lambda, while the adversary head itself trains normally
            lam = cfg.latent_adversary_weight
            z_rev = jax.lax.stop_gradient((1 + lam) * z) - lam * z
            logits = model.apply(variables, z_rev,
                                 method=RAVE.adversary_logits)
            oh = jax.nn.one_hot(batch["speaker"], cfg.speaker_classes)
            aux["adv_ce"] = -jnp.mean(jnp.sum(
                jax.nn.log_softmax(logits.astype(jnp.float32)) * oh, -1))
            aux["adv_acc"] = jnp.mean(
                (jnp.argmax(logits, -1) == batch["speaker"]).astype(
                    jnp.float32))
        emb = jnp.broadcast_to(emb[:, None, :],
                               (z.shape[0], z.shape[1], emb.shape[-1]))
        z_dec = jnp.concatenate([z_dec, emb], axis=-1)
    else:
        enabled = schedules.quantize_enabled(step, cfg)
        out = model.apply(variables, z_pre, r[0], True, enabled,
                          method=RAVE.reparametrize, rngs=rngs,
                          mutable=mutable or False)
        if mutable:
            (z, reg), rep_state = out
            new_state = {**new_state, **unfreeze(rep_state)}
        else:
            z, reg = out
        z_dec = z

    # pitch conditioning: normalised f0 from the *clean* signal appended
    # to the decoder latent (fork myforward, export.py:349-397).  Stats
    # come from the per-speaker json when the trainer provides them
    # (reference global_speaker_dict, model.py:316-317), else
    # per-utterance (export.py:349-354).
    if cfg.pitch_embedding_size > 0:
        from ..ops import pitch as P
        feat = P.pitch_feature(
            x, z_dec.shape[1], cfg.sampling_rate, hop=cfg.pitch_hop,
            fmin=cfg.pitch_fmin, fmax=cfg.pitch_fmax,
            median=batch.get("f0_median"), std=batch.get("f0_std"),
            channels=cfg.pitch_embedding_size,
            estimator=cfg.pitch_estimator, fcpe_ckpt=cfg.pitch_ckpt)
        z_dec = jnp.concatenate([z_dec, jax.lax.stop_gradient(feat)],
                                axis=-1)

    warm = schedules.warmed_up(step, cfg)
    bands_y = model.apply(variables, z_dec, r[1], warm,
                          method=RAVE.decode_bands, rngs=rngs)

    # valid-signal crop by the static receptive field
    # (reference model.py:364-372 with the runtime-probed RF buffer)
    if cfg.valid_signal_crop:
        lc, rc = receptive_field_frames(cfg)
        if lc + rc >= bands_x.shape[1]:
            raise ValueError(
                f"valid_signal_crop removes {lc}+{rc} band frames but the "
                f"clip has only {bands_x.shape[1]}; raise n_signal to at "
                f"least ~{(lc + rc + 1) * cfg.n_band * 2} samples or set "
                "valid_signal_crop=false")
        sl = slice(lc, bands_x.shape[1] - rc if rc else None)
        bands_x = bands_x[:, sl]
        bands_y = bands_y[:, sl]
    x_full = model.apply(variables, bands_x, method=RAVE.pqmf_inverse)
    y_full = model.apply(variables, bands_y, method=RAVE.pqmf_inverse)

    # reconstruction distance
    dists = {}
    if cfg.recon_loss == "mrstft":
        res = L.mr_stft_resolutions(cfg.sampling_rate, cfg.mr_stft_specs_ms)
        sc, mag = L.multi_resolution_stft_loss(y_full[..., 0], x_full[..., 0],
                                               res)
        dists["audio"] = (sc + mag) * cfg.mr_stft_weight
    else:
        dists["multiband_spectral_distance"] = L.audio_distance_v1(
            bands_x, bands_y, cfg.stft_scales, cfg.log_epsilon,
            cfg.sampling_rate)
        dists["fullband_spectral_distance"] = L.audio_distance_v1(
            x_full, y_full, cfg.stft_scales, cfg.log_epsilon,
            cfg.sampling_rate)

    return dict(x=x_full, y=y_full, z=z_dec, reg=reg, ce=ce_loss,
                dists=dists, new_state=new_state, warm=warm, aux=aux)


def receptive_field_frames(cfg: RAVEConfig) -> tuple[int, int]:
    """Static (left, right) crop in *band frames* standing in for the
    reference's autograd-probed receptive field (``core.py:190-226``).

    For the fully-convolutional v2 graph the RF is dominated by the
    dilated stacks; we use a conservative analytic bound: the total
    effective kernel extent of encoder+decoder at the band rate, split
    symmetrically (causal graphs put it all on the left).
    """
    ke = 2 * cfg.kernel_size + 1
    rf = ke  # in/out convs
    stride = 1
    for r, dils in zip(cfg.ratios,
                       cfg.dilations if not isinstance(cfg.dilations[0], int)
                       else [cfg.dilations] * len(cfg.ratios)):
        for d in dils:
            rf += ((cfg.kernel_size - 1) * d) * stride
        rf += 2 * r * stride
        stride *= r
    # rf is the total encoder kernel extent in band frames; the decoder
    # mirrors it.  PQMF analysis+synthesis add their own taps at the
    # band rate (the autograd probe on v2 measures 1113 band frames per
    # side vs rf=1041 without them).  A 9/8 margin on top covers the
    # remainder (validated against utils.receptive_field in
    # tests/test_train.py).
    pq_right = 0
    if cfg.n_band > 1:
        from ..ops.pqmf import _pqmf_kernels
        Ha, pad_a, Hs, pad_s = _pqmf_kernels(cfg.pqmf_attenuation,
                                             cfg.n_band)
        rf += Ha.shape[0] + Hs.shape[0]
        # the offline PQMF is centered even in causal configs (its
        # streaming form carries the delay in the cache instead), so its
        # right padding is a real right-side receptive field the crop
        # must cover -- the autograd probe measures ~(pad_a + pad_s)
        # band frames on the right of an otherwise causal graph
        pq_right = pad_a + pad_s
    rf_frames = max(1, rf * 9 // 8)
    if cfg.causal:
        return 2 * rf_frames, max(1, pq_right * 9 // 8 + 1)
    return rf_frames, rf_frames


# ----------------------------------------------------------------------
# the step
# ----------------------------------------------------------------------

def _metric_names(cfg: RAVEConfig) -> tuple[str, ...]:
    """Canonical metric set so both lax.cond branches return identical
    pytree structures."""
    names = ["loss_adversarial", "loss_feature_matching", "loss_ce",
             "loss_gen_total", "loss_dis", "loss_regularization"]
    if cfg.recon_loss == "mrstft":
        names.append("loss_audio")
    else:
        names += ["loss_multiband_spectral_distance",
                  "loss_fullband_spectral_distance"]
    if cfg.speaker_embedding_size > 0 and cfg.speaker_classes > 0:
        names += ["loss_speaker_ce", "speaker_accuracy"]
        if cfg.latent_adversary_weight > 0:
            names += ["loss_latent_adversary", "latent_adversary_accuracy"]
    return tuple(sorted(names))


def _fill_metrics(cfg, partial_metrics):
    out = {k: jnp.float32(0.0) for k in _metric_names(cfg)}
    out.update({k: jnp.asarray(v, jnp.float32)
                for k, v in partial_metrics.items()})
    return out


def make_train_step(cfg: RAVEConfig):
    model = RAVE(cfg=cfg)
    disc = build_discriminator(cfg)
    enc_tx, dec_tx, dis_tx, spk_tx = make_optimizers(cfg)

    def gen_loss_fn(gen_params, state: TrainState, batch, rng):
        out = _forward_losses(cfg, model, disc, gen_params, state.dis_params,
                              state.model_state, batch, rng, state.step)
        loss_terms = dict(out["dists"])
        beta = schedules.beta_factor(state.step, cfg)
        if cfg.speaker_embedding_size == 0:
            # every latent head's regulariser rides the beta schedule
            # (upstream model.py:535-536: KL / MMD / RVQ commitment;
            # spherical returns 0) -- the speaker fork detaches z and
            # trains the encoder by CE only (model.py:349,359)
            loss_terms["regularization"] = out["reg"] * beta

        def with_disc(_):
            loss_dis, loss_adv, fm = _gan_terms(cfg, disc, state.dis_params,
                                                out["x"], out["y"])
            return loss_adv, fm

        def without_disc(_):
            return jnp.float32(0.0), jnp.float32(0.0)

        loss_adv, fm = jax.lax.cond(out["warm"], with_disc, without_disc,
                                    None)
        loss_terms["adversarial"] = loss_adv
        loss_terms["feature_matching"] = fm

        total = jnp.float32(0.0)
        for k, v in loss_terms.items():
            total = total + v * cfg.weights.get(k, 1.0)
        total = total + out["ce"]

        metrics = {f"loss_{k}": v for k, v in loss_terms.items()}
        metrics["loss_ce"] = out["ce"]
        if "spk_ce" in out["aux"]:
            spk_ce = out["aux"]["spk_ce"]
            total = total + spk_ce * cfg.weights.get("speaker_ce", 1.0)
            metrics["loss_speaker_ce"] = spk_ce
            metrics["speaker_accuracy"] = out["aux"]["spk_acc"]
        if "adv_ce" in out["aux"]:
            # the reversal scaling lives inside the z_rev trick; the CE
            # itself rides at weight 1 so the adversary head trains at
            # full strength
            total = total + out["aux"]["adv_ce"]
            metrics["loss_latent_adversary"] = out["aux"]["adv_ce"]
            metrics["latent_adversary_accuracy"] = out["aux"]["adv_acc"]
        metrics["loss_gen_total"] = total
        return total, (out["new_state"], _fill_metrics(cfg, metrics))

    def dis_loss_fn(dis_params, state: TrainState, batch, rng):
        out = _forward_losses(cfg, model, disc, state.gen_params, dis_params,
                              state.model_state, batch, rng, state.step)
        y = jax.lax.stop_gradient(out["y"])
        loss_dis, _, _ = _gan_terms(cfg, disc, dis_params, out["x"], y)
        return loss_dis, (out["new_state"],
                          _fill_metrics(cfg, {"loss_dis": loss_dis}))

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def do_gen(state):
            (loss, (new_state, metrics)), grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True)(state.gen_params, state, batch, rng)
            eg, sg = _enc_group(cfg), _spk_group(cfg)
            enc_g, dec_g, spk_g, _ = _split_groups(grads, eg, sg)
            enc_p, dec_p, spk_p, _ = _split_groups(state.gen_params, eg, sg)
            enc_u, enc_opt = enc_tx.update(enc_g, state.enc_opt, enc_p)
            dec_u, dec_opt = dec_tx.update(dec_g, state.dec_opt, dec_p)
            new_params = dict(state.gen_params)
            for k, v in optax.apply_updates(enc_p, enc_u).items():
                new_params[k] = v
            for k, v in optax.apply_updates(dec_p, dec_u).items():
                new_params[k] = v
            spk_opt = state.spk_opt
            if spk_p:
                spk_u, spk_opt = spk_tx.update(spk_g, state.spk_opt, spk_p)
                for k, v in optax.apply_updates(spk_p, spk_u).items():
                    new_params[k] = v
            ema = state.ema_params
            if ema is not None and cfg.ema_decay:
                d = cfg.ema_decay
                ema = jax.tree.map(lambda e, p: e * d + p * (1 - d),
                                   ema, new_params)
            return state.replace(gen_params=new_params, enc_opt=enc_opt,
                                 dec_opt=dec_opt, model_state=new_state,
                                 ema_params=ema, spk_opt=spk_opt), \
                metrics

        def do_dis(state):
            (loss, (new_state, metrics)), grads = jax.value_and_grad(
                dis_loss_fn, has_aux=True)(state.dis_params, state, batch, rng)
            dis_u, dis_opt = dis_tx.update(grads, state.dis_opt,
                                           state.dis_params)
            new_dis = optax.apply_updates(state.dis_params, dis_u)
            return state.replace(dis_params=new_dis, dis_opt=dis_opt,
                                 model_state=new_state), metrics

        # unify metric structures: run cond over the two branches
        is_dis = schedules.is_discriminator_step(state.step, cfg)
        # schedule metrics belong to the step whose losses they rode
        # (computing them after the increment logged the NEXT step's
        # beta/warmed_up next to THIS step's losses)
        this_step = state.step
        state, metrics = jax.lax.cond(is_dis, do_dis, do_gen, state)
        state = state.replace(step=state.step + 1)
        metrics["beta"] = schedules.beta_factor(this_step, cfg)
        metrics["warmed_up"] = schedules.warmed_up(this_step, cfg)
        return state, metrics

    return train_step


def make_eval_step(cfg: RAVEConfig):
    """Validation reconstruction distance + posterior latents (reference
    ``validation_step``, model.py:636-686; the returned latent means feed
    the PCA fidelity fit, upstream model.py:753-779)."""
    model = RAVE(cfg=cfg, train_mode=False)

    def eval_step(state: TrainState, batch, rng):
        x = batch["x"]
        variables = {"params": state.gen_params, **state.model_state}
        rngs = {"latent": rng, "noise": rng, "quantizer": rng}
        y = model.apply(variables, x, rngs=rngs)
        t = min(x.shape[1], y.shape[1])
        dist = L.audio_distance_v1(x[:, :t], y[:, :t], cfg.stft_scales,
                                   cfg.log_epsilon, cfg.sampling_rate)
        bands = model.apply(variables, x, method=RAVE.pqmf_forward)
        z_pre = model.apply(variables, x, bands, method=RAVE.encode_input,
                            rngs=rngs)
        if cfg.latent_head == "variational":
            z_mean = jnp.split(z_pre, 2, axis=-1)[0]
        else:
            z_mean = z_pre
        metrics = {"validation": dist}
        if cfg.hubert_units > 0 and "units" in batch:
            # held-out discrete-unit prediction quality (the CE teacher
            # target) -- objective evidence the latent carries content,
            # not just reconstruction; same definition as the trained
            # objective (unit_ce_terms)
            ce, acc = unit_ce_terms(model, variables, z_pre,
                                    batch["units"], cfg.hubert_units)
            metrics["val_unit_ce"] = ce
            metrics["val_unit_accuracy"] = acc
        return metrics, y, z_mean

    return eval_step
