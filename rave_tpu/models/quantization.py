"""Residual vector quantization with EMA codebooks (SoundStream Alg. 1).

TPU-native counterpart of reference ``rave/quantization.py`` (lucidrains-
derived).  Codebook state (embed / embed_avg / cluster_size / inited)
lives in a ``"quantizer"`` variable collection so the EMA update is part
of the functional train step; under data parallelism the batch statistics
are ``psum``-reduced over ``axis_name`` before the EMA so every replica
applies the identical update (the reference merely relies on
same-decision determinism, ``quantization.py:169-171``).

K-means init on the first batch and dead-code expiry keep the reference
semantics but run under ``lax.cond`` with explicit PRNG keys, so the whole
quantizer is a single compiled program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def _sample_vectors(rng, samples: jax.Array, num: int) -> jax.Array:
    """Pick ``num`` rows from samples (with replacement if too few) --
    reference ``quantization.py:25-33``."""
    n = samples.shape[0]
    idx = jax.random.randint(rng, (num,), 0, n)
    return samples[idx]


def _kmeans(rng, samples: jax.Array, num_clusters: int, iters: int):
    """Fixed-iteration k-means (reference ``quantization.py:36-56``)."""
    means = _sample_vectors(rng, samples, num_clusters)

    def body(_, means):
        dists = -(jnp.sum(samples ** 2, -1, keepdims=True)
                  - 2 * samples @ means.T
                  + jnp.sum(means ** 2, -1)[None])
        buckets = jnp.argmax(dists, -1)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        bins = jnp.sum(onehot, 0)
        new_means = (onehot.T @ samples) / jnp.clip(bins, 1.0)[:, None]
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, iters, body, means)
    dists = -(jnp.sum(samples ** 2, -1, keepdims=True)
              - 2 * samples @ means.T + jnp.sum(means ** 2, -1)[None])
    buckets = jnp.argmax(dists, -1)
    bins = jnp.sum(jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype), 0)
    return means, bins


class EuclideanCodebook(nn.Module):
    """EMA codebook (reference ``quantization.py:59-181``)."""
    dim: int
    codebook_size: int
    kmeans_init: bool = True
    kmeans_iters: int = 50
    decay: float = 0.99
    epsilon: float = 1e-5
    threshold_ema_dead_code: float = 2.0
    axis_name: Optional[str] = None

    def _psum(self, x):
        if self.axis_name is not None:
            try:
                return jax.lax.psum(x, self.axis_name)
            except NameError:
                return x
        return x

    def setup(self):
        K, D = self.codebook_size, self.dim
        self._embed = self.variable("quantizer", "embed",
                                    lambda: jnp.zeros((K, D), jnp.float32))
        self._embed_avg = self.variable("quantizer", "embed_avg",
                                        lambda: jnp.zeros((K, D), jnp.float32))
        self._cluster_size = self.variable("quantizer", "cluster_size",
                                           lambda: jnp.zeros((K,), jnp.float32))
        self._inited = self.variable(
            "quantizer", "inited",
            lambda: jnp.asarray(0.0 if self.kmeans_init else 1.0, jnp.float32))

    def decode(self, idx: jax.Array) -> jax.Array:
        return self._embed.value[idx]

    def __call__(self, x: jax.Array, train: bool = False):
        """x: (N, dim) flattened vectors -> (quantized, indices)."""
        K = self.codebook_size
        embed, embed_avg = self._embed, self._embed_avg
        cluster_size, inited = self._cluster_size, self._inited

        xf = x.astype(jnp.float32)

        if train:
            rng = self.make_rng("quantizer")

            def do_init(_):
                means, bins = _kmeans(rng, xf, K, self.kmeans_iters)
                return means, means, bins

            def no_init(_):
                return embed.value, embed_avg.value, cluster_size.value

            e, ea, cs = jax.lax.cond(inited.value < 0.5, do_init, no_init, None)
            embed.value, embed_avg.value, cluster_size.value = e, ea, cs
            inited.value = jnp.maximum(inited.value, 1.0)

        # nearest neighbour
        dist = -(jnp.sum(xf ** 2, -1, keepdims=True)
                 - 2 * xf @ embed.value.T
                 + jnp.sum(embed.value ** 2, -1)[None])
        idx = jnp.argmax(dist, -1)
        quantized = embed.value[idx].astype(x.dtype)

        if train:
            onehot = jax.nn.one_hot(idx, K, dtype=jnp.float32)
            counts = self._psum(jnp.sum(onehot, 0))
            embed_sum = self._psum(onehot.T @ xf)

            # dead-code expiry BEFORE the EMA update, like the reference
            # (quantization.py:168-179 order: expire, then EMA)
            if self.threshold_ema_dead_code > 0:
                expired = cluster_size.value < self.threshold_ema_dead_code
                rng2 = self.make_rng("quantizer")
                fresh = _sample_vectors(rng2, xf, K)
                embed.value = jnp.where(expired[:, None], fresh, embed.value)

            cluster_size.value = (cluster_size.value * self.decay
                                  + counts * (1 - self.decay))
            embed_avg.value = (embed_avg.value * self.decay
                               + embed_sum * (1 - self.decay))
            n = jnp.sum(cluster_size.value)
            smoothed = ((cluster_size.value + self.epsilon)
                        / (n + K * self.epsilon) * n)
            embed.value = embed_avg.value / smoothed[:, None]

        return quantized, idx


class VectorQuantization(nn.Module):
    """One VQ stage with straight-through + commitment loss
    (reference ``quantization.py:184-270``)."""
    dim: int
    codebook_size: int
    codebook_dim: Optional[int] = None
    decay: float = 0.99
    kmeans_init: bool = True
    kmeans_iters: int = 50
    threshold_ema_dead_code: float = 2.0
    commitment_weight: float = 1.0
    axis_name: Optional[str] = None

    def setup(self):
        self.codebook = EuclideanCodebook(
            dim=self.codebook_dim or self.dim,
            codebook_size=self.codebook_size,
            kmeans_init=self.kmeans_init, kmeans_iters=self.kmeans_iters,
            decay=self.decay,
            threshold_ema_dead_code=self.threshold_ema_dead_code,
            axis_name=self.axis_name)

    def __call__(self, x: jax.Array, train: bool = False):
        """x: (B, T, dim) -> (quantized, indices, commit_loss)."""
        B, T, D = x.shape
        flat = x.reshape(-1, D)
        q, idx = self.codebook(flat, train=train)
        q = q.reshape(B, T, D)
        idx = idx.reshape(B, T)
        loss = jnp.float32(0.0)
        if train:
            q_st = x + jax.lax.stop_gradient(q - x)
            if self.commitment_weight > 0:
                loss = self.commitment_weight * jnp.mean(
                    (jax.lax.stop_gradient(q) - x) ** 2)
            q = q_st
        return q, idx, loss

    def encode(self, x: jax.Array) -> jax.Array:
        B, T, D = x.shape
        _, idx = self.codebook(x.reshape(-1, D), train=False)
        return idx.reshape(B, T)

    def decode(self, idx: jax.Array) -> jax.Array:
        return self.codebook.decode(idx)


class ResidualVectorQuantization(nn.Module):
    """N-stage residual VQ (reference ``quantization.py:273-318``)."""
    num_quantizers: int
    dim: int
    codebook_size: int
    axis_name: Optional[str] = None

    def setup(self):
        self.layers = [
            VectorQuantization(dim=self.dim, codebook_size=self.codebook_size,
                               axis_name=self.axis_name,
                               name=f"vq{i}")
            for i in range(self.num_quantizers)]

    def __call__(self, x: jax.Array, train: bool = False):
        quantized_out = jnp.zeros_like(x)
        residual = x
        losses, indices = [], []
        for layer in self.layers:
            q, idx, loss = layer(residual, train=train)
            residual = residual - q
            quantized_out = quantized_out + q
            losses.append(loss)
            indices.append(idx)
        total_loss = jnp.sum(jnp.stack(losses)) if losses else jnp.float32(0.0)
        return quantized_out, total_loss, jnp.stack(indices, 1)  # (B, N, T)

    def encode(self, x: jax.Array) -> jax.Array:
        residual = x
        out = []
        for layer in self.layers:
            idx = layer.encode(residual)
            q = layer.decode(idx)
            residual = residual - q
            out.append(idx)
        return jnp.stack(out, 1)

    def decode(self, q_indices: jax.Array) -> jax.Array:
        out = 0.0
        for i, layer in enumerate(self.layers):
            out = out + layer.decode(q_indices[:, i])
        return out
