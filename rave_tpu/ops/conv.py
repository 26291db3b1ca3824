"""Streaming-first 1D convolutions for TPU.

This is the TPU-native replacement for the reference's external
``cached_conv`` package (reference ``rave/__init__.py:14-27`` registers
``cc.Conv1d`` / ``cc.ConvTranspose1d`` / ``cc.get_padding`` /
``cc.AlignBranches``; every conv in ``rave/blocks.py`` and
``rave/pqmf.py:245-263`` goes through it).

Design (not a port):

* Layout is ``(batch, time, channels)`` -- channels ride the TPU lane
  dimension, time the sublanes, so XLA lowers the convs onto the MXU as
  batched matmuls.
* Offline mode applies the asymmetric ``(left, right)`` padding computed
  by :func:`rave_tpu.ops.delay.get_padding` at trace time.
* Streaming mode carries an explicit left-context cache as a flax
  ``"cache"`` variable collection: ``apply({'params': p, 'cache': c}, x,
  mutable=['cache'])`` is a pure step function ``(c, x) -> (y, c')`` that
  can be ``lax.scan``-ed or AOT-compiled for realtime use.  All delay
  bookkeeping (the reference's ``cumulative_delay``) is static Python
  computed at build time -- see :mod:`rave_tpu.ops.delay`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .delay import (ConvPlan, ConvTransposePlan, get_padding, plan_conv,
                    plan_conv_transpose)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class StreamSetup:
    """Global conv behaviour, threaded through every module.

    Replaces the reference's *global mutable* switches
    (``cc.use_cached_conv``; ``configs/causal.gin:5`` rebinding
    ``cc.get_padding.mode``) with an explicit, hashable config.
    """
    mode: str = "centered"  # "centered" | "causal"
    streaming: bool = False

    def causal(self) -> "StreamSetup":
        return dataclasses.replace(self, mode="causal")

    def stream(self) -> "StreamSetup":
        return dataclasses.replace(self, streaming=True)


def _torch_conv_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) -- matches torch Conv1d defaults

    so parameter statistics line up with the reference at init.
    """
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normalize_kernel(v: jax.Array, g: jax.Array) -> jax.Array:
    """Weight normalisation, per output channel (torch ``weight_norm`` with
    dim=0 on an ``(out, in, k)`` weight == norm over (in, k) per out)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True) + 1e-12)
    return v * (g / norm)


class Conv1d(nn.Module):
    """Strided / dilated / grouped conv with offline+streaming modes.

    Equivalent capability to ``cc.Conv1d`` (used throughout reference
    ``rave/blocks.py``), rebuilt for ``(B, T, C)`` layout and explicit
    state.  ``in_delay`` is the accumulated delay of the input stream in
    input-rate frames; the conv folds in an alignment delay so its output
    delay is integral (see :func:`rave_tpu.ops.delay.plan_conv`).
    """
    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    in_delay: int = 0
    ss: StreamSetup = StreamSetup()
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @property
    def plan(self) -> ConvPlan:
        return plan_conv(self.kernel_size, self.stride, self.dilation,
                         self.ss.mode, self.in_delay)

    @property
    def out_delay(self) -> int:
        return self.plan.out_delay

    @nn.compact
    def __call__(self, x: jax.Array,
                 return_weights: bool = False):
        """Apply the conv; with ``return_weights=True``, only create the
        parameters and return ``(kernel, bias)`` (weight-norm resolved)
        so a caller can feed them to a fused Pallas kernel -- the param
        tree is identical either way."""
        plan = self.plan
        in_ch = x.shape[-1]
        if in_ch % self.groups:
            raise ValueError(f"channels {in_ch} not divisible by groups {self.groups}")
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        fan_in = self.kernel_size * in_ch // self.groups
        if self.weight_norm:
            v = self.param("v", _torch_conv_init(fan_in), kshape, self.param_dtype)
            g = self.param("g", lambda *_: jnp.sqrt(
                jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True)),
                           (1, 1, self.features), self.param_dtype)
            kernel = normalize_kernel(v, g)
        else:
            kernel = self.param("kernel", _torch_conv_init(fan_in), kshape,
                                self.param_dtype)
        bias = (self.param("bias", _torch_conv_init(fan_in),
                           (self.features,), self.param_dtype)
                if self.use_bias else None)

        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)

        if return_weights:
            b = (bias.astype(dtype) if bias is not None
                 else jnp.zeros((self.features,), dtype))
            return kernel, b

        if self.ss.streaming:
            if plan.cache_len > 0:
                cache = self.variable(
                    "cache", "ctx",
                    lambda: jnp.zeros((x.shape[0], plan.cache_len, in_ch), dtype))
                xx = jnp.concatenate([cache.value.astype(dtype), x], axis=1)
                cache.value = xx[:, xx.shape[1] - plan.cache_len:]
            else:
                xx = x
            pad = [(0, 0)]
        else:
            xx = x
            pad = [(plan.pad_left, plan.pad_right)]

        # NOTE: preferred_element_type must equal the operand dtype here --
        # mixing (bf16 operands, f32 preferred) breaks the conv VJP's dtype
        # matching; the TPU MXU accumulates bf16 convs in f32 internally.
        y = jax.lax.conv_general_dilated(
            xx, kernel,
            window_strides=(self.stride,),
            padding=pad,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
            preferred_element_type=dtype,
        )
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Strided transposed conv (upsampler) with offline+streaming modes.

    Offline semantics match the reference upsampler
    (``rave/blocks.py:182-186``: ``ConvTranspose1d(2r, stride=r,
    padding=r//2)``).  Streaming keeps an overlap-add tail of
    ``kernel - stride`` output frames in the cache.
    """
    features: int
    kernel_size: int
    stride: int
    crop: Optional[int] = None  # default: stride // 2 (reference convention)
    use_bias: bool = False  # reference: cc.ConvTranspose1d.bias=False (v1.gin:34)
    weight_norm: bool = False
    in_delay: int = 0
    ss: StreamSetup = StreamSetup()
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    def _crop(self) -> int:
        # NOTE: the reference's upsampler keeps centered semantics even in
        # causal configs (``rave/blocks.py:649-653`` passes an explicit
        # ``padding=r//2`` that ``configs/causal.gin`` does not touch); the
        # streaming delay (= crop) accounts for the lookahead instead.
        return self.stride // 2 if self.crop is None else self.crop

    @property
    def plan(self) -> ConvTransposePlan:
        return plan_conv_transpose(self.kernel_size, self.stride,
                                   self._crop(), self.in_delay)

    @property
    def out_delay(self) -> int:
        return self.plan.out_delay

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        plan = self.plan
        in_ch = x.shape[-1]
        k, s = self.kernel_size, self.stride
        kshape = (k, in_ch, self.features)
        fan_in = k * in_ch  # torch ConvTranspose fan-in uses out_ch*k; keep simple
        if self.weight_norm:
            v = self.param("v", _torch_conv_init(fan_in), kshape, self.param_dtype)
            g = self.param("g", lambda *_: jnp.sqrt(
                jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True)),
                           (1, 1, self.features), self.param_dtype)
            kernel = normalize_kernel(v, g)
        else:
            kernel = self.param("kernel", _torch_conv_init(fan_in), kshape,
                                self.param_dtype)
        bias = (self.param("bias", _torch_conv_init(fan_in),
                           (self.features,), self.param_dtype)
                if self.use_bias else None)

        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        w = jnp.flip(kernel, axis=0).astype(dtype)

        T = x.shape[1]

        def full(z):
            # full (uncropped) transposed conv output: length (T-1)*s + k
            return jax.lax.conv_general_dilated(
                z, w,
                window_strides=(1,),
                padding=[(k - 1, k - 1)],
                lhs_dilation=(s,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=dtype,
            )

        if self.ss.streaming:
            y_full = full(x)  # (B, (T-1)*s + k, F)
            tail_len = plan.tail_len
            if tail_len > 0:
                cache = self.variable(
                    "cache", "tail",
                    lambda: jnp.zeros((x.shape[0], tail_len, self.features), dtype))
                y_full = y_full.at[:, :tail_len].add(cache.value.astype(dtype))
                cache.value = y_full[:, T * s:]
            y = y_full[:, :T * s]
        else:
            c = self._crop()
            y_full = full(x)
            end = y_full.shape[1] - c
            y = y_full[:, c:end]
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class Delay(nn.Module):
    """Pure delay line of ``frames`` output-rate frames.

    Offline mode is the identity (offline centered graphs have zero
    delay); in streaming mode this is the primitive behind branch
    alignment (reference ``cc.AlignBranches``, ``rave/blocks.py:37-41``).
    """
    frames: int
    ss: StreamSetup = StreamSetup()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if not self.ss.streaming or self.frames == 0:
            return x
        buf = self.variable(
            "cache", "buf",
            lambda: jnp.zeros((x.shape[0], self.frames, x.shape[-1]), x.dtype))
        xx = jnp.concatenate([buf.value.astype(x.dtype), x], axis=1)
        buf.value = xx[:, x.shape[1]:]
        return xx[:, :x.shape[1]]


def stream_init(module: nn.Module, params, x_shape, dtype=jnp.float32):
    """Build a zeroed streaming cache for ``module`` given an input shape."""
    x = jnp.zeros(x_shape, dtype)
    variables = module.init(jax.random.PRNGKey(0), x)
    return variables.get("cache", {})
