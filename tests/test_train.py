"""Training-step smoke tests (a gap the reference leaves, SURVEY §4):
losses finite, params update, phase logic flips, RVQ EMA state moves."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.config import build_config
from rave_tpu.train.loop import init_state, make_train_step

TINY = ["capacity=4", "n_signal=2048", "batch_size=2",
        "valid_signal_crop=false", "stft_scales=[512,256]",
        "phase_1_duration=2", "update_discriminator_every=2"]


def tiny_cfg(extra=(), preset="v2"):
    cfg = build_config([preset], TINY + list(extra))
    cfg.discriminator.kind = "multi_scale"
    cfg.discriminator.capacity = 4
    cfg.discriminator.n_layers = 2
    return cfg


def make_batch(cfg, seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed),
                          (cfg.batch_size, cfg.n_signal, 1)) * 0.1
    return {"x": x}


def test_v2_train_steps_update_params():
    cfg = tiny_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    p0 = jax.tree.leaves(state.gen_params)[0].copy()
    metrics_hist = []
    for i in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        metrics_hist.append(jax.tree.map(float, m))
    # all finite
    for m in metrics_hist:
        for k, v in m.items():
            assert np.isfinite(v), f"{k} not finite: {v}"
    # params changed
    p1 = jax.tree.leaves(state.gen_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert int(state.step) == 4
    # phase flip: steps 0,1 are pure phase-1 (no dis loss)
    assert metrics_hist[0]["loss_dis"] == 0.0
    assert metrics_hist[0]["loss_gen_total"] != 0.0
    # after warmup (step>=2), every 2nd step trains D
    assert metrics_hist[2]["loss_dis"] != 0.0  # step counter 2 -> dis step


def test_discrete_rvq_state_updates():
    cfg = tiny_cfg(["latent_size=8", "num_quantizers=2", "codebook_size=16",
                    "phase_1_duration=100"], preset="discrete")
    cfg.discriminator.kind = "multi_scale"
    cfg.discriminator.capacity = 4
    cfg.discriminator.n_layers = 2
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    q0 = state.model_state["quantizer"]
    emb0 = np.asarray(jax.tree.leaves(q0)[0]).copy()
    state, m = step(state, batch, jax.random.PRNGKey(1))
    q1 = state.model_state["quantizer"]
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(q0), jax.tree.leaves(q1)))
    assert changed, "RVQ EMA state did not update"
    assert np.isfinite(float(m["loss_gen_total"]))


def test_eval_step():
    from rave_tpu.train.loop import make_eval_step
    cfg = tiny_cfg()
    state = init_state(cfg, jax.random.PRNGKey(0))
    ev = jax.jit(make_eval_step(cfg))
    m, y, z = ev(state, make_batch(cfg), jax.random.PRNGKey(3))
    assert np.isfinite(float(m["validation"]))
    assert y.shape == (cfg.batch_size, cfg.n_signal, 1)
    assert z.shape[-1] == cfg.latent_size


def test_fork_train_step_with_units_and_speaker():
    """The voice-conversion fork path: CE loss on precomputed units,
    frozen speaker embedding, MR-STFT reconstruction, detached latent
    (reference model.py:301-592)."""
    cfg = build_config(["v2_fork"], TINY)
    cfg.discriminator.kind = "multi_scale"
    cfg.discriminator.capacity = 4
    cfg.discriminator.n_layers = 2
    cfg.discriminator.member_weights = None
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    batch["units"] = jax.random.randint(jax.random.PRNGKey(3),
                                        (cfg.batch_size, 148), 0,
                                        cfg.hubert_units)
    p_enc0 = np.asarray(jax.tree.leaves(state.gen_params["encoder"])[0]).copy()
    state, m = step(state, batch, jax.random.PRNGKey(1))
    m = jax.tree.map(float, m)
    assert np.isfinite(m["loss_ce"]) and m["loss_ce"] > 0
    assert np.isfinite(m["loss_audio"])
    p_enc1 = np.asarray(jax.tree.leaves(state.gen_params["encoder"])[0])
    assert not np.allclose(p_enc0, p_enc1), "encoder got no CE gradient"
    # frozen speaker encoder must not move
    s0 = jax.tree.leaves(state.gen_params["speaker_encoder"])[0]
    state, _ = step(state, batch, jax.random.PRNGKey(2))
    s1 = jax.tree.leaves(state.gen_params["speaker_encoder"])[0]
    assert np.allclose(np.asarray(s0), np.asarray(s1))


def test_fork_speaker_classification_aux_loss():
    """`speaker_classes>0` + `train_speaker_encoder=true`: the linear
    speaker-id head trains by CE and its gradient reaches the speaker
    encoder, making the from-scratch embedding discriminative (the
    in-run stand-in for the reference's VoxCeleb pretraining,
    model.py:165-174)."""
    cfg = build_config(["v2_fork"], TINY + [
        "train_speaker_encoder=true", "speaker_classes=4"])
    cfg.discriminator.kind = "multi_scale"
    cfg.discriminator.capacity = 4
    cfg.discriminator.n_layers = 2
    cfg.discriminator.member_weights = None
    state = init_state(cfg, jax.random.PRNGKey(0))
    assert "speaker_classifier" in state.gen_params
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    batch["units"] = jax.random.randint(jax.random.PRNGKey(3),
                                        (cfg.batch_size, 148), 0,
                                        cfg.hubert_units)
    batch["speaker"] = jnp.arange(cfg.batch_size, dtype=jnp.int32) % 4
    c0 = np.asarray(
        jax.tree.leaves(state.gen_params["speaker_classifier"])[0]).copy()
    s0 = np.asarray(
        jax.tree.leaves(state.gen_params["speaker_encoder"])[0]).copy()
    state, m = step(state, batch, jax.random.PRNGKey(1))
    m = jax.tree.map(float, m)
    assert np.isfinite(m["loss_speaker_ce"]) and m["loss_speaker_ce"] > 0
    assert 0.0 <= m["speaker_accuracy"] <= 1.0
    c1 = np.asarray(jax.tree.leaves(state.gen_params["speaker_classifier"])[0])
    s1 = np.asarray(jax.tree.leaves(state.gen_params["speaker_encoder"])[0])
    assert not np.allclose(c0, c1), "classifier head got no gradient"
    assert not np.allclose(s0, s1), "speaker encoder got no CE gradient"


def test_v1_batchnorm_running_stats_update():
    """EncoderV1 BatchNorm keeps real running statistics: training steps
    update the batch_stats collection (reference nn.BatchNorm1d,
    blocks.py:445,461) and eval consumes the frozen stats."""
    from rave_tpu.train.loop import make_eval_step
    cfg = tiny_cfg(["ratios=[2,2,2,2]"], preset="v1")
    state = init_state(cfg, jax.random.PRNGKey(0))
    assert "batch_stats" in state.model_state, \
        "v1 model carries no BatchNorm running stats"
    bn0 = jax.tree.map(lambda a: np.asarray(a).copy(),
                       state.model_state["batch_stats"])
    step = jax.jit(make_train_step(cfg))
    state, m = step(state, make_batch(cfg), jax.random.PRNGKey(1))
    bn1 = state.model_state["batch_stats"]
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(jax.tree.leaves(bn0), jax.tree.leaves(bn1)))
    assert changed, "BatchNorm running stats did not update"
    assert np.isfinite(float(m["loss_gen_total"]))
    # eval path (use_running_average) runs and is finite
    ev = jax.jit(make_eval_step(cfg))
    vm, y, z = ev(state, make_batch(cfg, 2), jax.random.PRNGKey(3))
    assert np.isfinite(float(vm["validation"]))


def test_ema_weights_track():
    cfg = tiny_cfg(["ema_decay=0.5"])
    state = init_state(cfg, jax.random.PRNGKey(0))
    assert state.ema_params is not None
    step = jax.jit(make_train_step(cfg))
    state, _ = step(state, make_batch(cfg), jax.random.PRNGKey(1))
    e = np.asarray(jax.tree.leaves(state.ema_params)[0])
    p = np.asarray(jax.tree.leaves(state.gen_params)[0])
    assert not np.allclose(e, p), "EMA should lag params"


def test_project_2d_and_status_logger(tmp_path):
    """Speaker-eval 2D projection (reference train_rave.py:205-214) and
    the status.json side-channel (reference core.py:502-544)."""
    from rave_tpu.train.eval_viz import project_2d
    from rave_tpu.train.trainer import MetricLogger

    embs = np.random.default_rng(0).standard_normal((40, 16)).astype(
        np.float32)
    pts = project_2d(embs)
    assert pts.shape == (40, 2) and np.isfinite(pts).all()

    lg = MetricLogger(str(tmp_path))
    lg.status(100, {"steps_per_s": 1.5})
    import json as _json
    rec = _json.loads((tmp_path / "status.json").read_text())
    assert rec["step"] == 100 and rec["steps_per_s"] == 1.5


def test_combine_disc_train_step_packed_spectral():
    """The production v2 discriminator (combine: periods+scales+spectral)
    through the real jitted train step: PackedFeature objects must flow
    through value_and_grad, the lax.cond branches, and the FM/GAN losses
    with finite results on BOTH the G and D branches."""
    cfg = build_config(["v2"], TINY + ["phase_1_duration=0"])
    cfg.discriminator.kind = "combine"
    cfg.discriminator.capacity = 4
    cfg.discriminator.spectral_scales = (512, 256)
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    saw_dis = saw_gen = False
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        m = jax.tree.map(float, m)
        for k, v in m.items():
            assert np.isfinite(v), f"step {i}: {k} not finite: {v}"
        if m["loss_dis"] != 0.0:
            saw_dis = True
        if m["loss_feature_matching"] != 0.0:
            saw_gen = True
    assert saw_dis and saw_gen


def test_spectral_disc_rejects_too_short_signal():
    """A spectral scale longer than the signal must fail loudly at trace
    time instead of producing empty STFT frames and silent NaN losses."""
    from rave_tpu.models.discriminators import MultiScaleSpectralDiscriminator
    d = MultiScaleSpectralDiscriminator(scales=(4096,), capacity=4)
    x = jnp.zeros((1, 2048, 1))
    with pytest.raises(ValueError, match="spectral discriminator scale"):
        d.init(jax.random.PRNGKey(0), x)


RF_MATRIX = {
    "v2_small": (["v2"], ["capacity=4", "n_band=4", "kernel_size=3",
                          "ratios=[2,2]", "dilations=[1,3]"]),
    "v2_causal": (["v2", "causal"], ["capacity=4", "n_band=4",
                                     "kernel_size=3", "ratios=[2,2]",
                                     "dilations=[1,3]"]),
    "v2_big_dilations": (["v2"], ["capacity=4", "n_band=4",
                                  "kernel_size=3", "ratios=[4,2]",
                                  "dilations=[1,3,9]"]),
    "v2_keep_dim": (["v2"], ["capacity=4", "n_band=4", "kernel_size=3",
                             "ratios=[2,2]", "dilations=[1,3]",
                             "keep_dim=true"]),
    "v2_snake": (["v2", "snake"], ["capacity=4", "n_band=4",
                                   "kernel_size=3", "ratios=[2,2]",
                                   "dilations=[1,3]"]),
    "v1_small": (["v1"], ["capacity=4", "n_band=4",
                          "ratios=[2,2]",
                          "v1_kernel_sizes=[3]",
                          "v1_dilations_list=[[1,1],[3,1]]"]),
}


@pytest.mark.parametrize("name", sorted(RF_MATRIX))
def test_valid_signal_crop_covers_measured_receptive_field(name):
    """The analytic crop bound must cover (and not wildly exceed) the
    autograd-measured receptive field (reference core.py:190-226) --
    across the preset matrix (causal / keep_dim / big dilations / snake /
    v1), not just the v2 default: an under-crop would silently change
    every loss (VERDICT r2 weak #4)."""
    from rave_tpu.models.rave import RAVE
    from rave_tpu.models.latent import VariationalHead
    from rave_tpu.train.loop import receptive_field_frames
    from rave_tpu.utils.receptive_field import measure_receptive_field

    presets, overrides = RF_MATRIX[name]
    cfg = build_config(presets, overrides)
    model = RAVE(cfg=cfg, train_mode=False)
    x = jnp.zeros((1, 4096, 1), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "latent": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
            "quantizer": jax.random.PRNGKey(3)}
    v = model.init(rngs, x)

    def apply_fn(inp):
        bands = model.apply(v, inp, method=RAVE.pqmf_forward)
        z = model.apply(v, inp, bands, method=RAVE.encode_input,
                        rngs={"latent": jax.random.PRNGKey(4)})
        mean, _ = VariationalHead.mean_scale(z)
        y = model.apply(v, mean, None, False, method=RAVE.decode_bands,
                        rngs={"noise": jax.random.PRNGKey(5)})
        return model.apply(v, y, method=RAVE.pqmf_inverse)

    left, right = measure_receptive_field(apply_fn, T=4096)
    need_l = left // cfg.n_band + 1   # band frames per side
    need_r = right // cfg.n_band + 1
    lc, rc = receptive_field_frames(cfg)
    assert lc >= need_l, (name, lc, need_l)
    assert rc >= need_r, (name, rc, need_r)
    assert lc <= 6 * max(need_l, 1), (name, lc, need_l)  # not absurd


def test_valid_signal_crop_rejects_short_clips():
    cfg = tiny_cfg(["valid_signal_crop=true"])
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    with pytest.raises(ValueError, match="valid_signal_crop"):
        step(state, make_batch(cfg), jax.random.PRNGKey(1))


def test_wasserstein_noise_aug_roundtrip_and_train():
    """noise_augmentation: encode returns the raw latent (reference
    exports raw z, scripts/export.py:503-517) and decode re-samples the
    noise channels, so decode(encode(x)) and the train step must both
    work with the same parameter tree."""
    cfg = build_config(["v2", "wasserstein"],
                       TINY + ["noise_augmentation=8", "latent_size=4"])
    cfg.discriminator.kind = "multi_scale"
    cfg.discriminator.capacity = 4
    cfg.discriminator.n_layers = 2
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    state, m = step(state, make_batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss_gen_total"]))

    from rave_tpu.models.rave import RAVE
    model = RAVE(cfg=cfg, train_mode=False)
    x = make_batch(cfg)["x"]
    variables = {"params": state.gen_params, **state.model_state}
    rngs = {"latent": jax.random.PRNGKey(2),
            "noise": jax.random.PRNGKey(3)}
    z = model.apply(variables, x, method=RAVE.encode, rngs=rngs)
    assert z.shape[-1] == cfg.latent_size  # raw latent, no noise channels
    y = model.apply(variables, z, method=RAVE.decode, rngs=rngs)
    assert y.shape == x.shape


def test_ema_eval_view_swaps_weights():
    """Validation/best-ckpt selection runs on EMA shadow weights when EMA
    is enabled (reference scripts/train.py:64-103 swaps EMA weights in
    around validation)."""
    from rave_tpu.train.trainer import ema_eval_view
    cfg = tiny_cfg(["ema_decay=0.5"])
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    state, _ = step(state, make_batch(cfg), jax.random.PRNGKey(1))
    view = ema_eval_view(cfg, state)
    assert view is not state
    e = np.asarray(jax.tree.leaves(state.ema_params)[0])
    v = np.asarray(jax.tree.leaves(view.gen_params)[0])
    assert np.array_equal(e, v)
    # without EMA the view is a pass-through
    cfg2 = tiny_cfg([])
    state2 = init_state(cfg2, jax.random.PRNGKey(0))
    assert ema_eval_view(cfg2, state2) is state2


def test_training_reduces_reconstruction_loss():
    """Convergence regression: 40 tiny phase-1 steps on a fixed tone
    batch must reduce the reconstruction distance (full-scale evidence
    lives in docs/convergence.md: v2 validation 26.1 -> 6.9 over 12k
    steps on TPU)."""
    cfg = tiny_cfg(["learning_rate=1e-3", "phase_1_duration=1000"])
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    t = np.arange(cfg.n_signal) / cfg.sampling_rate
    x = np.stack([0.5 * np.sin(2 * np.pi * f * t) for f in (220.0, 330.0)])
    batch = {"x": jnp.asarray(x[..., None], jnp.float32)}
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(40):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss_multiband_spectral_distance"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.85 * first, (first, last)


def test_latent_adversary_gradient_reversal():
    """`latent_adversary_weight>0`: the adversary head trains (its CE is
    finite and its params move) and the encoder receives the REVERSED
    gradient (its params move even with unit CE absent)."""
    cfg = build_config(["v2_fork"], TINY + [
        "train_speaker_encoder=true", "speaker_classes=4",
        "latent_adversary_weight=0.5", "hubert_units=0"])
    cfg.discriminator.kind = "multi_scale"
    cfg.discriminator.capacity = 4
    cfg.discriminator.n_layers = 2
    cfg.discriminator.member_weights = None
    state = init_state(cfg, jax.random.PRNGKey(0))
    assert "latent_adversary" in state.gen_params
    step = jax.jit(make_train_step(cfg))
    batch = make_batch(cfg)
    batch["speaker"] = jnp.arange(cfg.batch_size, dtype=jnp.int32) % 4
    a0 = np.asarray(
        jax.tree.leaves(state.gen_params["latent_adversary"])[0]).copy()
    e0 = np.asarray(jax.tree.leaves(state.gen_params["encoder"])[0]).copy()
    state, m = step(state, batch, jax.random.PRNGKey(1))
    m = jax.tree.map(float, m)
    assert np.isfinite(m["loss_latent_adversary"])
    assert m["loss_latent_adversary"] > 0
    a1 = np.asarray(jax.tree.leaves(state.gen_params["latent_adversary"])[0])
    e1 = np.asarray(jax.tree.leaves(state.gen_params["encoder"])[0])
    assert not np.allclose(a0, a1), "adversary head got no gradient"
    assert not np.allclose(e0, e1), "encoder got no reversed gradient"
