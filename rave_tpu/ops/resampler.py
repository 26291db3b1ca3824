"""Integer-ratio resampler as fixed-kernel convs (reference
``rave/resampler.py:9-66``): kaiser lowpass at 140 dB, strided conv down,
polyphase conv up.  Streamable via the same cache machinery (ratio must
be even for centered padding to stream exactly, like the reference's
power-of-2 restriction)."""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from .conv import StreamSetup
from .delay import plan_conv
from .pqmf import kaiser_filter


@lru_cache(maxsize=None)
def _filters(ratio: int):
    filt = kaiser_filter(np.pi / ratio, 140).astype(np.float32)
    # downsample kernel: (taps, 1, 1)
    down = filt.reshape(-1, 1, 1)
    # upsample polyphase: pad to multiple of ratio, (phases=ratio, taps)
    pad = (-len(filt)) % ratio
    f = np.pad(filt, (pad, 0)).reshape(-1, ratio).T  # (ratio, taps)
    pad2 = (f.shape[-1] + 1) % 2
    f = np.pad(f, [(0, 0), (pad2, 0)])
    up = np.ascontiguousarray(f.T[:, None, :])  # (taps, 1, ratio)
    return down, up


class Resampler(nn.Module):
    """target_sr <-> model_sr, ratio = target_sr // model_sr."""
    target_sr: int
    model_sr: int
    ss: StreamSetup = StreamSetup()

    @property
    def ratio(self) -> int:
        assert self.target_sr % self.model_sr == 0
        return self.target_sr // self.model_sr

    def _conv(self, x, kernel, stride, name):
        taps = kernel.shape[0]
        plan = plan_conv(taps, stride, mode=self.ss.mode)
        if self.ss.streaming:
            cache = self.variable(
                "cache", name,
                lambda: jnp.zeros((x.shape[0], plan.cache_len, x.shape[-1]),
                                  x.dtype))
            xx = jnp.concatenate([cache.value.astype(x.dtype), x], axis=1)
            cache.value = xx[:, xx.shape[1] - plan.cache_len:]
            pad = [(0, 0)]
        else:
            xx = x
            pad = [(plan.pad_left, plan.pad_right)]
        return jax.lax.conv_general_dilated(
            xx, jnp.asarray(kernel, x.dtype), window_strides=(stride,),
            padding=pad, dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return self.to_model_sr(x)

    @nn.compact
    def to_model_sr(self, x: jax.Array) -> jax.Array:
        """(B, T, 1) at target_sr -> (B, T/ratio, 1) at model_sr."""
        if self.ratio == 1:
            return x
        down, _ = _filters(self.ratio)
        return self._conv(x, down, self.ratio, "down_ctx")

    @nn.compact
    def from_model_sr(self, x: jax.Array) -> jax.Array:
        """(B, T, 1) at model_sr -> (B, T*ratio, 1) at target_sr."""
        if self.ratio == 1:
            return x
        _, up = _filters(self.ratio)
        y = self._conv(x, up, 1, "up_ctx")  # (B, T, ratio)
        B, T, R = y.shape
        return (y * R).reshape(B, T * R, 1)