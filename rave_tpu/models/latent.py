"""Latent regularisation heads: variational / wasserstein / spherical /
discrete (reference ``rave/blocks.py:713-842``).

Each head wraps an encoder trunk and exposes ``reparametrize(z, rng)``
returning ``(z, reg)``.  They are thin linen modules so their parameters
live under the encoder optimizer group, like the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .quantization import ResidualVectorQuantization


class VariationalHead(nn.Module):
    """Reparametrised Gaussian + closed-form KL
    (reference ``VariationalEncoder``, ``rave/blocks.py:713-740``).
    Input z: (B, T, 2*latent) -> (B, T, latent)."""

    @nn.compact
    def __call__(self, z: jax.Array, rng: Optional[jax.Array] = None):
        mean, scale = jnp.split(z, 2, axis=-1)
        std = jax.nn.softplus(scale) + 1e-4
        var = std * std
        logvar = jnp.log(var)
        if rng is None:
            rng = self.make_rng("latent")
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        zs = mean + eps * std
        kl = jnp.mean(jnp.sum(mean * mean + var - logvar - 1, axis=-1))
        return zs, kl

    @staticmethod
    def mean_scale(z: jax.Array):
        return jnp.split(z, 2, axis=-1)

    @staticmethod
    def num_out() -> int:
        return 2


class WassersteinHead(nn.Module):
    """RBF-kernel MMD to N(0, I) (reference ``WasserteinEncoder``,
    ``rave/blocks.py:743-785``)."""
    noise_augmentation: int = 0

    @staticmethod
    def _mean_kernel(x, y):
        d = jnp.mean((x[:, None] - y[None]) ** 2, axis=2) / x.shape[-1]
        return jnp.mean(jnp.exp(-d))

    @nn.compact
    def __call__(self, z: jax.Array, rng: Optional[jax.Array] = None):
        B, T, C = z.shape
        flat = z.reshape(-1, C)
        if rng is None:
            rng = self.make_rng("latent")
        r1, r2 = jax.random.split(rng)
        ref = jax.random.normal(r1, flat.shape, flat.dtype)
        mmd = (self._mean_kernel(flat, flat) + self._mean_kernel(ref, ref)
               - 2 * self._mean_kernel(flat, ref))
        if self.noise_augmentation:
            noise = jax.random.normal(r2, (B, T, self.noise_augmentation),
                                      z.dtype)
            z = jnp.concatenate([z, noise], axis=-1)
        return z, mmd

    @staticmethod
    def num_out() -> int:
        return 1


class SphericalHead(nn.Module):
    """L2-normalised latent, zero regulariser (reference
    ``SphericalEncoder``, ``rave/blocks.py:826-842``)."""

    @nn.compact
    def __call__(self, z: jax.Array, rng: Optional[jax.Array] = None):
        norm = jnp.linalg.norm(z, axis=-1, keepdims=True)
        return z / (norm + 1e-12), jnp.float32(0.0)

    @staticmethod
    def num_out() -> int:
        return 1


class DiscreteHead(nn.Module):
    """Residual VQ head (reference ``DiscreteEncoder``,
    ``rave/blocks.py:788-823``).  ``enabled`` gating (QuantizeCallback)
    is a traced scalar carried by the train state."""
    num_quantizers: int
    latent_size: int
    codebook_size: int = 1024
    noise_augmentation: int = 0
    axis_name: Optional[str] = None

    def setup(self):
        self.rvq = ResidualVectorQuantization(
            num_quantizers=self.num_quantizers, dim=self.latent_size,
            codebook_size=self.codebook_size, axis_name=self.axis_name)

    def __call__(self, z: jax.Array, rng: Optional[jax.Array] = None,
                 train: bool = False, enabled=True):
        zq, diff, _ = self.rvq(z, train=train)
        gate = jnp.asarray(enabled, z.dtype)
        z = gate * zq + (1 - gate) * z
        diff = gate * diff
        if self.noise_augmentation:
            if rng is None:
                rng = self.make_rng("latent")
            noise = jax.random.normal(
                rng, (*z.shape[:2], self.noise_augmentation), z.dtype)
            z = jnp.concatenate([z, noise], axis=-1)
        return z, diff

    def encode(self, z: jax.Array) -> jax.Array:
        return self.rvq.encode(z)

    def decode(self, idx: jax.Array) -> jax.Array:
        return self.rvq.decode(idx)

    @staticmethod
    def num_out() -> int:
        return 1


def unit_norm_vector_to_angles(x: jax.Array) -> jax.Array:
    """Unit vector -> generalised spherical angles in [-1, 1]
    (reference ``rave/blocks.py:926-939``).  x: (B, T, C)."""
    import numpy as np
    xr = jnp.flip(x, axis=-1) ** 2
    cums = jnp.cumsum(xr, axis=-1)          # reversed cumulative sums
    # norms_k = sqrt(sum_{j>=k} x_j^2) for k in 0..C-2
    norms = jnp.sqrt(jnp.flip(cums, axis=-1)[..., :-1] + 1e-12)
    angles = jnp.arccos(jnp.clip(x[..., :-1] / norms, -1.0, 1.0))
    last = jnp.where(x[..., -1:] >= 0, angles[..., -1:],
                     2 * np.pi - angles[..., -1:])
    angles = jnp.concatenate([angles[..., :-1] / np.pi,
                              last / (2 * np.pi)], axis=-1)
    return 2 * (angles - 0.5)


def angles_to_unit_norm_vector(angles: jax.Array) -> jax.Array:
    """Inverse of :func:`unit_norm_vector_to_angles`
    (reference ``rave/blocks.py:942-957``)."""
    import numpy as np
    a = (angles / 2 + 0.5) % 1.0
    a = jnp.concatenate([a[..., :-1] * np.pi,
                         a[..., -1:] * (2 * np.pi)], axis=-1)
    cos = jnp.cos(a)
    sin = jnp.cumprod(jnp.sin(a), axis=-1)
    ones = jnp.ones_like(cos[..., :1])
    cos = jnp.concatenate([cos, ones], axis=-1)
    sin = jnp.concatenate([ones, sin], axis=-1)
    return cos * sin


LATENT_HEADS = {
    "variational": VariationalHead,
    "wasserstein": WassersteinHead,
    "spherical": SphericalHead,
    "discrete": DiscreteHead,
}
