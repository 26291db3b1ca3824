"""Pallas fused dilated-unit kernel vs the XLA reference implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rave_tpu.ops.pallas.residual_unit import (_reference_impl,
                                               fused_dilated_unit)


@pytest.mark.parametrize("dilation", [1, 3, 9])
def test_fused_unit_matches_reference(dilation):
    rng = jax.random.PRNGKey(0)
    B, T, C, k = 2, 512, 128, 3
    ks = jax.random.split(rng, 5)
    x = jax.random.normal(ks[0], (B, T, C), jnp.float32)
    w1 = jax.random.normal(ks[1], (k, C, C)) * 0.05
    b1 = jax.random.normal(ks[2], (C,)) * 0.1
    w2 = jax.random.normal(ks[3], (C, C)) * 0.05
    b2 = jax.random.normal(ks[4], (C,)) * 0.1
    p = (k - 1) * dilation
    pl_, pr = (p + 1) // 2, p // 2

    ref = _reference_impl(x, w1, b1, w2, b2, dilation, pl_, pr)
    got = jax.jit(fused_dilated_unit, static_argnums=(5, 6, 7))(
        x, w1, b1, w2, b2, dilation, pl_, pr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


def test_fused_unit_grad_matches_reference():
    rng = jax.random.PRNGKey(1)
    B, T, C, k, d = 1, 256, 128, 3, 3
    ks = jax.random.split(rng, 5)
    x = jax.random.normal(ks[0], (B, T, C), jnp.float32)
    w1 = jax.random.normal(ks[1], (k, C, C)) * 0.05
    b1 = jnp.zeros((C,))
    w2 = jax.random.normal(ks[3], (C, C)) * 0.05
    b2 = jnp.zeros((C,))
    p = (k - 1) * d
    pl_, pr = (p + 1) // 2, p // 2

    def loss_fused(w):
        return jnp.sum(fused_dilated_unit(x, w, b1, w2, b2, d, pl_, pr) ** 2)

    def loss_ref(w):
        return jnp.sum(_reference_impl(x, w, b1, w2, b2, d, pl_, pr) ** 2)

    g1 = jax.grad(loss_fused)(w1)
    g2 = jax.grad(loss_ref)(w1)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-2, rtol=1e-2)


def test_fused_model_param_tree_and_output_match():
    """fused_kernels=true must keep the identical param tree (so
    checkpoints interchange) and the same outputs (CPU falls back to the
    XLA reference impl; TPU runs the Pallas kernel)."""
    from rave_tpu.config import build_config
    from rave_tpu.models.rave import RAVE

    over = ["capacity=64", "n_signal=8192", "batch_size=1",
            "ratios=[2,2]", "dilations=[[1,3],[1,3]]"]
    rngs = {"params": jax.random.PRNGKey(0),
            "latent": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2),
            "quantizer": jax.random.PRNGKey(3)}
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 8192, 1)) * 0.3

    cfg0 = build_config(["v2"], over)
    m0 = RAVE(cfg=cfg0, train_mode=False)
    v0 = jax.jit(m0.init)(rngs, x)

    cfg1 = build_config(["v2"], over + ["fused_kernels=true"])
    m1 = RAVE(cfg=cfg1, train_mode=False)
    v1 = jax.jit(m1.init)(rngs, x)

    p0 = jax.tree.structure(v0["params"])
    p1 = jax.tree.structure(v1["params"])
    assert p0 == p1, "fused model changed the param tree"

    r = {"latent": jax.random.PRNGKey(4), "noise": jax.random.PRNGKey(5)}
    y0 = jax.jit(lambda v, a: m0.apply(v, a, rngs=r))(v0, x)
    y1 = jax.jit(lambda v, a: m1.apply(v, a, rngs=r))(v0, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("T,pad", [(1000, (7, 7)), (4096, (7, 7)),
                                   (777, (14, 0))])
def test_ci1_conv_pallas_fwd_matches_native(T, pad):
    """Pallas ci=1 head conv (interpret mode off-TPU) == XLA conv."""
    from rave_tpu.ops.pallas.ci1_conv import _native_fwd, _pallas_fwd
    k, co = sum(pad) + 1, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.normal(ks[0], (2, T, 1), jnp.float32)
    w = jax.random.normal(ks[1], (k, 1, co)) * 0.3
    ref = _native_fwd(x, w, pad)
    got = _pallas_fwd(x, w, pad, tile=256, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ci1_conv_pallas_dx_matches_native():
    from rave_tpu.ops.pallas.ci1_conv import _native_fwd, _pallas_dx
    k, co, T = 15, 16, 1000
    pad = (7, 7)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (2, T, 1), jnp.float32)
    w = jax.random.normal(ks[1], (k, 1, co)) * 0.3
    g = jax.random.normal(ks[2], (2, T, co))
    _, dx_fn = jax.vjp(lambda xx: _native_fwd(xx, w, pad), x)
    (ref,) = dx_fn(g)
    got = _pallas_dx(g, w, pad, T, tile=256, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
