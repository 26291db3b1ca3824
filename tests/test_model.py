"""Config-matrix integration test (the reference's
``tests/test_configs.py`` idiom): build each config stack at tiny
capacity, run full encode->decode, assert shape preservation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.config import build_config
from rave_tpu.models.rave import RAVE

TINY = ["capacity=4", "n_signal=4096", "batch_size=1"]

CONFIGS = [
    ["v1"],
    ["v2"],
    ["v2", "adain"],
    ["v2", "wasserstein"],
    ["v2", "spherical"],
    ["discrete"],
    ["discrete", "snake"],
    ["discrete", "snake", "adain"],
    ["discrete", "snake", "descript_discriminator"],
    ["discrete", "spectral_discriminator"],
    ["v2", "noise"],
    ["v3"],
]
CONFIGS += [c + ["causal"] for c in CONFIGS[:4]]


def _rngs():
    return {"params": jax.random.PRNGKey(0),
            "latent": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
            "quantizer": jax.random.PRNGKey(3)}


@pytest.mark.parametrize("stack", CONFIGS,
                         ids=["+".join(c) for c in CONFIGS])
def test_config_matrix_autoencode(stack):
    cfg = build_config(stack, TINY)
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 4096, 1)) * 0.1
    variables = jax.jit(model.init)(_rngs(), x)
    y = jax.jit(model.apply)(variables, x,
                    rngs={"latent": jax.random.PRNGKey(4),
                          "noise": jax.random.PRNGKey(5)})
    assert y.shape == x.shape, f"{stack}: {y.shape} != {x.shape}"
    assert np.isfinite(np.asarray(y)).all()


def test_fork_voice_conversion_path():
    cfg = build_config(["v2_fork"], TINY)
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 4096, 1)) * 0.1
    tgt = jax.random.normal(jax.random.PRNGKey(10), (1, 4096, 1)) * 0.1
    variables = jax.jit(model.init)(_rngs(), x)
    convert = jax.jit(lambda v, a, b: model.apply(
        v, a, b, method=RAVE.convert,
        rngs={"latent": jax.random.PRNGKey(4),
              "noise": jax.random.PRNGKey(5)}))
    y = convert(variables, x, tgt)
    assert y.shape == x.shape


def test_latent_rate():
    cfg = build_config(["v2"], TINY)
    model = RAVE(cfg=cfg, train_mode=False)
    x = jnp.zeros((1, 4096, 1))
    variables = model.init(_rngs(), x)
    z = model.apply(variables, x, method=RAVE.encode,
                    rngs={"latent": jax.random.PRNGKey(4)})
    assert z.shape == (1, 4096 // cfg.total_ratio(), cfg.latent_size)


def test_hybrid_mel_encoder():
    """Hybrid config: mel front end + GRU decoder (configs/hybrid.gin;
    rates made consistent, see config.py)."""
    cfg = build_config(["hybrid"], ["capacity=4", "n_signal=8192",
                                    "batch_size=1"])
    model = RAVE(cfg=cfg, train_mode=False)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 8192, 1)) * 0.1
    variables = jax.jit(model.init)(_rngs(), x)
    y = jax.jit(model.apply)(variables, x,
                             rngs={"latent": jax.random.PRNGKey(4),
                                   "noise": jax.random.PRNGKey(5)})
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
