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
