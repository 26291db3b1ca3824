"""Neural building blocks: encoders, generators, residual stacks.

TPU-native re-design of reference ``rave/blocks.py`` (1165 LoC).  Layout
is ``(B, T, C)``; every block threads the static delay algebra of
:mod:`rave_tpu.ops.delay` instead of the reference's runtime
``cumulative_delay`` attributes, and streaming state lives in the
``"cache"`` variable collection (see :mod:`rave_tpu.ops.conv`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.conv import Conv1d, ConvTranspose1d, Delay, StreamSetup
from ..ops.delay import plan_conv, plan_conv_transpose
from ..ops.losses import amp_to_impulse_response, fft_convolve, mod_sigmoid


def normalize_dilations(dilations, ratios):
    """Reference ``rave/blocks.py:500-505``."""
    if isinstance(dilations[0], int):
        dilations = [dilations for _ in ratios]
    return list(dilations)


# Pure delay helpers: delay bookkeeping must never instantiate linen
# modules (constructing throwaway Modules inside an apply context
# corrupts flax name registration).

def conv_delay(kernel_size: int, stride: int = 1, dilation: int = 1,
               mode: str = "centered", in_delay: int = 0) -> int:
    return plan_conv(kernel_size, stride, dilation, mode, in_delay).out_delay


def upsample_delay(ratio: int, mode: str, in_delay: int = 0) -> int:
    if ratio > 1:
        return plan_conv_transpose(2 * ratio, ratio, ratio // 2,
                                   in_delay).out_delay
    return conv_delay(3, 1, 1, mode, in_delay)


def residual_layer_delay(kernel_size: int, dilations, mode: str) -> int:
    d = 0
    for dil in dilations:
        d = conv_delay(kernel_size, 1, dil, mode, d)
    return d


def residual_block_delay(kernel_size: int, dilations_list, mode: str) -> int:
    return sum(residual_layer_delay(kernel_size, dl, mode)
               for dl in dilations_list)


class Activation(nn.Module):
    """Switchable activation (reference gin macro ``ACTIVATION``,
    ``configs/snake.gin:5-22``).  ``snake`` carries a per-channel alpha
    parameter (reference ``Snake``, ``rave/blocks.py:845-853``)."""
    kind: str = "leaky_relu"  # "leaky_relu" | "snake"
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.kind == "leaky_relu":
            return nn.leaky_relu(x, self.negative_slope)
        if self.kind == "snake":
            alpha = self.param("alpha", nn.initializers.ones, (x.shape[-1],))
            alpha = alpha.astype(x.dtype)
            return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2
        raise ValueError(f"unknown activation {self.kind!r}")


class AdaIN(nn.Module):
    """Adaptive instance normalisation for inference-time timbre transfer
    (reference ``rave/blocks.py:856-919``).

    Running mean/std for the source (x) and target (y) streams live in an
    ``"adain"`` variable collection; ``learn_x`` / ``learn_y`` flags are
    carried as state so the exported graph can toggle them.  During
    training this is the identity, as in the reference.
    """
    dim: int
    train_mode: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B = x.shape[0]
        mean_x = self.variable("adain", "mean_x",
                               lambda: jnp.zeros((B, 1, self.dim)))
        std_x = self.variable("adain", "std_x",
                              lambda: jnp.ones((B, 1, self.dim)))
        n_x = self.variable("adain", "num_update_x", lambda: jnp.zeros(()))
        mean_y = self.variable("adain", "mean_y",
                               lambda: jnp.zeros((B, 1, self.dim)))
        std_y = self.variable("adain", "std_y",
                              lambda: jnp.ones((B, 1, self.dim)))
        n_y = self.variable("adain", "num_update_y", lambda: jnp.zeros(()))
        learn_x = self.variable("adain", "learn_x", lambda: jnp.zeros(()))
        learn_y = self.variable("adain", "learn_y", lambda: jnp.zeros(()))

        if self.train_mode or not self.is_mutable_collection("adain"):
            # training: identity (reference blocks.py:893-895); inference
            # with a frozen adain collection: apply the transfer only
            if not self.train_mode:
                use = ((learn_y.value <= 0) & (n_x.value > 0)
                       & (n_y.value > 0))
                transfer = (x - mean_x.value) / (std_x.value + 1e-5) \
                    * std_y.value + mean_y.value
                return jnp.where(use, transfer, x)
            return x

        mean = jnp.mean(x, axis=1, keepdims=True)
        std = jnp.std(x, axis=1, keepdims=True, ddof=1)

        def upd(tgt, src, n):
            return tgt + (src - tgt) / (n + 1)

        new_my = jnp.where(learn_y.value > 0, upd(mean_y.value, mean, n_y.value),
                           mean_y.value)
        new_sy = jnp.where(learn_y.value > 0, upd(std_y.value, std, n_y.value),
                           std_y.value)
        mean_y.value, std_y.value = new_my, new_sy
        n_y.value = n_y.value + (learn_y.value > 0)

        do_x = (learn_y.value <= 0) & (learn_x.value > 0)
        mean_x.value = jnp.where(do_x, upd(mean_x.value, mean, n_x.value),
                                 mean_x.value)
        std_x.value = jnp.where(do_x, upd(std_x.value, std, n_x.value),
                                std_x.value)
        n_x.value = n_x.value + do_x

        transfer = (x - mean_x.value) / (std_x.value + 1e-5) \
            * std_y.value + mean_y.value
        use = (learn_y.value <= 0) & (n_x.value > 0) & (n_y.value > 0)
        return jnp.where(use, transfer, x)


class GRULayer(nn.Module):
    """Optional recurrent layer (reference ``GRU``,
    ``rave/blocks.py:294-318``; used by the hybrid config).  Causal, so it
    adds no delay; streaming carries the hidden state in the cache."""
    dim: int
    num_layers: int = 1
    ss: StreamSetup = StreamSetup()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B = x.shape[0]
        for layer in range(self.num_layers):
            cell = nn.GRUCell(features=self.dim, name=f"cell{layer}")
            if self.ss.streaming:
                h = self.variable("cache", f"h{layer}",
                                  lambda: jnp.zeros((B, self.dim), x.dtype))
                carry = h.value.astype(x.dtype)
            else:
                carry = jnp.zeros((B, self.dim), x.dtype)
            carry, x = nn.RNN(cell, return_carry=True)(
                x, initial_carry=carry)
            if self.ss.streaming:
                h.value = carry
        return x


class DilatedUnit(nn.Module):
    """act -> dilated conv(k) -> act -> 1x1 conv
    (reference ``rave/blocks.py:84-113``).  Stride 1; own delay =
    the dilated conv's right-pad."""
    dim: int
    kernel_size: int
    dilation: int
    activation: str = "leaky_relu"
    weight_norm: bool = True
    ss: StreamSetup = StreamSetup()

    @property
    def out_delay(self) -> int:
        return conv_delay(self.kernel_size, 1, self.dilation, self.ss.mode)

    def fusable(self, in_ch: int) -> bool:
        """Whether the Pallas fused kernel can run this unit: offline,
        plain leaky_relu, square channels in the MXU-friendly range."""
        return (not self.ss.streaming
                and self.activation == "leaky_relu"
                and in_ch == self.dim
                and self.dim % 128 == 0 and self.dim <= 512)

    @nn.compact
    def __call__(self, x: jax.Array, weights_only: bool = False):
        if weights_only:
            # create the identical param tree but hand the resolved
            # kernels back for the fused Pallas path (see Residual)
            w1, b1 = Conv1d(features=self.dim, kernel_size=self.kernel_size,
                            dilation=self.dilation,
                            weight_norm=self.weight_norm,
                            ss=self.ss)(x, return_weights=True)
            w2, b2 = Conv1d(features=self.dim, kernel_size=1,
                            weight_norm=self.weight_norm,
                            ss=self.ss)(x, return_weights=True)
            return (w1, b1), (w2, b2)
        y = Activation(self.activation)(x)
        y = Conv1d(features=self.dim, kernel_size=self.kernel_size,
                   dilation=self.dilation, weight_norm=self.weight_norm,
                   ss=self.ss)(y)
        y = Activation(self.activation)(y)
        y = Conv1d(features=self.dim, kernel_size=1,
                   weight_norm=self.weight_norm, ss=self.ss)(y)
        return y


class Residual(nn.Module):
    """x + f(x) with the skip path delayed to match f's streaming delay
    (reference ``Residual`` + ``cc.AlignBranches``,
    ``rave/blocks.py:32-47``).

    With ``fused=True`` and a fusable :class:`DilatedUnit` inner, the
    whole act->conv->act->1x1->add chain runs as one Pallas kernel
    (:func:`rave_tpu.ops.pallas.residual_unit.fused_dilated_unit`) --
    same params, same math, one HBM round trip."""
    inner: nn.Module
    inner_delay: int
    ss: StreamSetup = StreamSetup()
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        du = self.inner
        if (self.fused and isinstance(du, DilatedUnit)
                and du.fusable(x.shape[-1])):
            from ..ops.delay import get_padding
            from ..ops.pallas.residual_unit import fused_dilated_unit
            (w1, b1), (w2, b2) = du(x, weights_only=True)
            pl_, pr_ = get_padding(du.kernel_size, 1, du.dilation,
                                   self.ss.mode)
            C = w2.shape[-1]
            return fused_dilated_unit(x, w1, b1, w2.reshape(C, C), b2,
                                      du.dilation, pl_, pr_)
        y = du(x)
        skip = Delay(frames=self.inner_delay, ss=self.ss)(x)
        return y + skip


class ResidualLayer(nn.Module):
    """Chain of (act, dilated conv) pairs wrapped in a residual
    (reference ``rave/blocks.py:49-81``)."""
    dim: int
    kernel_size: int
    dilations: Sequence[int]
    activation: str = "leaky_relu"
    weight_norm: bool = True
    ss: StreamSetup = StreamSetup()

    @property
    def inner_delay(self) -> int:
        d = 0
        for dil in self.dilations:
            d = conv_delay(self.kernel_size, 1, dil, self.ss.mode, d)
        return d

    @property
    def out_delay(self) -> int:
        return self.inner_delay

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = x
        for dil in self.dilations:
            y = Activation(self.activation)(y)
            y = Conv1d(features=self.dim, kernel_size=self.kernel_size,
                       dilation=dil, weight_norm=self.weight_norm,
                       ss=self.ss)(y)
        skip = Delay(frames=self.inner_delay, ss=self.ss)(x)
        return y + skip


class ResidualBlock(nn.Module):
    """Sequential ResidualLayers (reference ``rave/blocks.py:116-144``)."""
    dim: int
    kernel_size: int
    dilations_list: Sequence[Sequence[int]]
    activation: str = "leaky_relu"
    weight_norm: bool = True
    ss: StreamSetup = StreamSetup()

    @property
    def out_delay(self) -> int:
        return residual_block_delay(self.kernel_size, self.dilations_list,
                                    self.ss.mode)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for dil in self.dilations_list:
            x = ResidualLayer(dim=self.dim, kernel_size=self.kernel_size,
                              dilations=dil, activation=self.activation,
                              weight_norm=self.weight_norm, ss=self.ss)(x)
        return x


class ResidualStack(nn.Module):
    """Parallel ResidualBlocks (one per kernel size), delay-aligned and
    summed (reference ``rave/blocks.py:147-165``)."""
    dim: int
    kernel_sizes: Sequence[int]
    dilations_list: Sequence[Sequence[int]]
    activation: str = "leaky_relu"
    weight_norm: bool = True
    ss: StreamSetup = StreamSetup()

    def _branch_delays(self) -> list[int]:
        return [residual_block_delay(k, self.dilations_list, self.ss.mode)
                for k in self.kernel_sizes]

    @property
    def out_delay(self) -> int:
        return max(self._branch_delays())

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        delays = self._branch_delays()
        m = max(delays)
        out = None
        for k, d in zip(self.kernel_sizes, delays):
            y = ResidualBlock(dim=self.dim, kernel_size=k,
                              dilations_list=self.dilations_list,
                              activation=self.activation,
                              weight_norm=self.weight_norm, ss=self.ss)(x)
            y = Delay(frames=m - d, ss=self.ss)(y)
            out = y if out is None else out + y
        return out


class UpsampleLayer(nn.Module):
    """act + transposed conv upsampler (reference ``rave/blocks.py:168-196``)."""
    in_dim: int
    out_dim: int
    ratio: int
    activation: str = "leaky_relu"
    weight_norm: bool = True
    in_delay: int = 0
    ss: StreamSetup = StreamSetup()

    @property
    def out_delay(self) -> int:
        return upsample_delay(self.ratio, self.ss.mode, self.in_delay)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Activation(self.activation)(x)
        if self.ratio > 1:
            return ConvTranspose1d(features=self.out_dim,
                                   kernel_size=2 * self.ratio,
                                   stride=self.ratio,
                                   weight_norm=self.weight_norm,
                                   in_delay=self.in_delay, ss=self.ss)(x)
        return Conv1d(features=self.out_dim, kernel_size=3,
                      weight_norm=self.weight_norm,
                      in_delay=self.in_delay, ss=self.ss)(x)


class NoiseGeneratorV2(nn.Module):
    """Filtered-noise synthesiser (reference ``rave/blocks.py:244-291``).

    Downsampling conv stack -> ``mod_sigmoid(x - 5)`` band amplitudes ->
    windowed IR -> FFT-convolved uniform noise.  The reference uses plain
    causal-ish convs (``padding=(r, 0)``); here the convs are causal
    :class:`Conv1d` so the module streams exactly.
    """
    in_size: int
    hidden_size: int
    data_size: int
    ratios: Sequence[int]
    noise_bands: int
    activation: str = "leaky_relu"
    ss: StreamSetup = StreamSetup()

    @nn.compact
    def __call__(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        channels = ([self.in_size] + [self.hidden_size] * (len(self.ratios) - 1)
                    + [self.data_size * self.noise_bands])
        ss = dataclasses.replace(self.ss, mode="causal")
        for i, r in enumerate(self.ratios):
            x = Conv1d(features=channels[i + 1], kernel_size=2 * r, stride=r,
                       ss=ss)(x)
            if i != len(self.ratios) - 1:
                x = Activation(self.activation)(x)
        amp = mod_sigmoid(x - 5.0)  # (B, T', data_size * noise_bands)
        B, Tp, _ = amp.shape
        amp = amp.reshape(B, Tp, self.data_size, self.noise_bands)
        target = 1
        for r in self.ratios:
            target *= r
        ir = amp_to_impulse_response(amp, target)
        noise = jax.random.uniform(rng, ir.shape, ir.dtype, -1.0, 1.0)
        out = fft_convolve(noise, ir)  # (B, T', data_size, target)
        out = out.transpose(0, 1, 3, 2).reshape(B, Tp * target, self.data_size)
        return out

    @property
    def total_ratio(self) -> int:
        t = 1
        for r in self.ratios:
            t *= r
        return t


class EncoderV2(nn.Module):
    """Dilated residual encoder (reference ``rave/blocks.py:508-597``)."""
    data_size: int
    capacity: int
    ratios: Sequence[int]
    latent_size: int
    n_out: int
    kernel_size: int
    dilations: Sequence
    keep_dim: bool = False
    activation: str = "leaky_relu"
    weight_norm: bool = True
    adain: bool = False
    gru_layers: int = 0
    train_mode: bool = True
    fused: bool = False
    # accumulated delay of the input stream (e.g. the PQMF analysis delay)
    # in input-rate frames: threads into the strided convs' alignment so
    # composite streaming delays stay integral
    in_delay: int = 0
    ss: StreamSetup = StreamSetup()

    def _walk(self):
        """Yield (kind, kwargs) with running delay; returns final delay.

        Pure: uses only the static delay helpers, never module instances.
        """
        mode = self.ss.mode
        dilations_list = normalize_dilations(self.dilations, self.ratios)
        steps = []
        num_channels = self.capacity
        steps.append(("in_conv", dict(features=num_channels,
                                      kernel_size=2 * self.kernel_size + 1)))
        d = conv_delay(2 * self.kernel_size + 1, 1, 1, mode, self.in_delay)
        for r, dils in zip(self.ratios, dilations_list):
            for dil in dils:
                if self.adain:
                    steps.append(("adain", dict(dim=num_channels)))
                unit_d = conv_delay(self.kernel_size, 1, dil, mode)
                steps.append(("residual_unit",
                              dict(dim=num_channels, dilation=dil,
                                   inner_delay=unit_d)))
                d += unit_d
            out_channels = num_channels * (r if self.keep_dim else 2)
            steps.append(("down", dict(features=out_channels,
                                       kernel_size=2 * r,
                                       stride=r, in_delay=d)))
            d = conv_delay(2 * r, r, 1, mode, d)
            num_channels = out_channels
        steps.append(("out_conv", dict(features=self.latent_size * self.n_out,
                                       kernel_size=self.kernel_size)))
        d = conv_delay(self.kernel_size, 1, 1, mode, d)
        return steps, d

    @property
    def out_delay(self) -> int:
        return self._walk()[1]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        steps, _ = self._walk()
        for kind, kw in steps:
            if kind == "in_conv":
                x = Conv1d(features=kw["features"],
                           kernel_size=kw["kernel_size"],
                           weight_norm=self.weight_norm, ss=self.ss)(x)
            elif kind == "adain":
                x = AdaIN(dim=kw["dim"], train_mode=self.train_mode)(x)
            elif kind == "residual_unit":
                inner = DilatedUnit(dim=kw["dim"],
                                    kernel_size=self.kernel_size,
                                    dilation=kw["dilation"],
                                    activation=self.activation,
                                    weight_norm=self.weight_norm, ss=self.ss)
                x = Residual(inner=inner, inner_delay=kw["inner_delay"],
                             ss=self.ss, fused=self.fused)(x)
            elif kind == "down":
                x = Activation(self.activation)(x)
                x = Conv1d(features=kw["features"],
                           kernel_size=kw["kernel_size"], stride=kw["stride"],
                           in_delay=kw["in_delay"],
                           weight_norm=self.weight_norm, ss=self.ss)(x)
            elif kind == "out_conv":
                x = Activation(self.activation)(x)
                x = Conv1d(features=kw["features"],
                           kernel_size=kw["kernel_size"],
                           weight_norm=self.weight_norm, ss=self.ss)(x)
        if self.gru_layers:
            x = GRULayer(dim=x.shape[-1], num_layers=self.gru_layers,
                         ss=self.ss)(x)
        return x


class GeneratorV2(nn.Module):
    """Mirror decoder (reference ``rave/blocks.py:600-710``)."""
    data_size: int
    capacity: int
    ratios: Sequence[int]
    latent_size: int
    kernel_size: int
    dilations: Sequence
    keep_dim: bool = False
    amplitude_modulation: bool = False
    use_noise: bool = False
    noise_hidden: int = 128
    noise_ratios: Sequence[int] = (2, 2, 2)
    noise_bands: int = 5
    activation: str = "leaky_relu"
    weight_norm: bool = True
    adain: bool = False
    gru_layers: int = 0
    train_mode: bool = True
    fused: bool = False
    ss: StreamSetup = StreamSetup()

    def _plan(self):
        dilations_list = normalize_dilations(self.dilations, self.ratios)[::-1]
        ratios = list(self.ratios)[::-1]
        if self.keep_dim:
            num_channels = self.capacity
            for r in self.ratios:
                num_channels *= r
        else:
            num_channels = 2 ** len(ratios) * self.capacity
        return dilations_list, ratios, num_channels

    @property
    def out_delay(self) -> int:
        mode = self.ss.mode
        dilations_list, ratios, _ = self._plan()
        d = conv_delay(self.kernel_size, 1, 1, mode)
        for r, dils in zip(ratios, dilations_list):
            d = plan_conv_transpose(2 * r, r, r // 2, d).out_delay
            for dil in dils:
                d += conv_delay(self.kernel_size, 1, dil, mode)
        return conv_delay(self.kernel_size * 2 + 1, 1, 1, mode, d)

    @nn.compact
    def __call__(self, x: jax.Array,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        dilations_list, ratios, num_channels = self._plan()
        d = 0
        if self.gru_layers:
            # recurrent layer on the latent (reference blocks.py:628-629)
            x = GRULayer(dim=x.shape[-1], num_layers=self.gru_layers,
                         ss=self.ss)(x)
        x = Conv1d(features=num_channels, kernel_size=self.kernel_size,
                   weight_norm=self.weight_norm, ss=self.ss)(x)
        d = conv_delay(self.kernel_size, 1, 1, self.ss.mode)
        for r, dils in zip(ratios, dilations_list):
            out_channels = num_channels // (r if self.keep_dim else 2)
            x = Activation(self.activation)(x)
            up = ConvTranspose1d(features=out_channels, kernel_size=2 * r,
                                 stride=r, weight_norm=self.weight_norm,
                                 in_delay=d, ss=self.ss)
            x = up(x)
            d = up.out_delay
            num_channels = out_channels
            for dil in dils:
                if self.adain:
                    x = AdaIN(dim=num_channels, train_mode=self.train_mode)(x)
                inner = DilatedUnit(dim=num_channels,
                                    kernel_size=self.kernel_size,
                                    dilation=dil, activation=self.activation,
                                    weight_norm=self.weight_norm, ss=self.ss)
                x = Residual(inner=inner, inner_delay=inner.out_delay,
                             ss=self.ss, fused=self.fused)(x)
                d += inner.out_delay
        x = Activation(self.activation)(x)

        wave_features = self.data_size * (2 if self.amplitude_modulation else 1)
        waveform = Conv1d(features=wave_features,
                          kernel_size=self.kernel_size * 2 + 1,
                          weight_norm=self.weight_norm, ss=self.ss)(x)

        noise = None
        if self.use_noise:
            ng = NoiseGeneratorV2(in_size=num_channels,
                                  hidden_size=self.noise_hidden,
                                  data_size=self.data_size,
                                  ratios=self.noise_ratios,
                                  noise_bands=self.noise_bands,
                                  activation=self.activation, ss=self.ss)
            if rng is None:
                rng = self.make_rng("noise")
            noise = ng(x, rng)

        if self.amplitude_modulation:
            wav, amp = jnp.split(waveform, 2, axis=-1)
            waveform = wav * jax.nn.sigmoid(amp)

        if noise is not None:
            waveform = waveform + noise

        return jnp.tanh(waveform)


# ------------------------- v1 blocks ------------------------------------


class EncoderV1(nn.Module):
    """Strided-conv encoder (reference ``Encoder``, ``rave/blocks.py:422-497``).

    Norm options mirror the reference: per-sample norm (``SampleNorm``,
    blocks.py:26-29) or real BatchNorm with running statistics
    (``nn.BatchNorm1d``, blocks.py:445,461) -- training normalises with
    batch stats and updates the running averages (``batch_stats``
    collection, checkpointed with the model state), while eval/streaming
    uses the frozen running stats, a fixed per-channel affine, so
    streaming inference is chunk-size invariant.
    """
    data_size: int
    capacity: int
    latent_size: int
    ratios: Sequence[int]
    n_out: int
    sample_norm: bool = False
    repeat_layers: int = 1
    activation: str = "leaky_relu"
    weight_norm: bool = False
    train_mode: bool = True
    ss: StreamSetup = StreamSetup()

    def _norm(self, x):
        if self.sample_norm:
            return x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        # torch BatchNorm1d defaults: eps 1e-5, momentum 0.1 (flax's
        # momentum is the running-average retention, so 0.9)
        return nn.BatchNorm(use_running_average=not self.train_mode,
                            momentum=0.9, epsilon=1e-5)(x)

    @property
    def out_delay(self) -> int:
        mode = self.ss.mode
        d = conv_delay(7, 1, 1, mode)
        for r in self.ratios:
            d = conv_delay(2 * r + 1, r, 1, mode, d)
            for _ in range(self.repeat_layers - 1):
                d = conv_delay(3, 1, 1, mode, d)
        return conv_delay(5, 1, 1, mode, d)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv1d(features=self.capacity, kernel_size=7,
                   weight_norm=self.weight_norm, ss=self.ss)(x)
        d = conv_delay(7, 1, 1, self.ss.mode)
        for i, r in enumerate(self.ratios):
            out_dim = 2 ** (i + 1) * self.capacity
            x = self._norm(x)
            x = Activation(self.activation)(x)
            conv = Conv1d(features=out_dim, kernel_size=2 * r + 1, stride=r,
                          in_delay=d, weight_norm=self.weight_norm, ss=self.ss)
            x = conv(x)
            d = conv.out_delay
            for _ in range(self.repeat_layers - 1):
                x = self._norm(x)
                x = Activation(self.activation)(x)
                conv = Conv1d(features=out_dim, kernel_size=3, in_delay=d,
                              weight_norm=self.weight_norm, ss=self.ss)
                x = conv(x)
                d = conv.out_delay
        x = Activation(self.activation)(x)
        x = Conv1d(features=self.latent_size * self.n_out, kernel_size=5,
                   groups=self.n_out, in_delay=d,
                   weight_norm=self.weight_norm, ss=self.ss)(x)
        return x


class NoiseGeneratorV1(nn.Module):
    """v1 filtered-noise branch (reference ``NoiseGenerator``,
    ``rave/blocks.py:199-241``).  Downsampling convs use kernel ``2r``
    (the reference's ``k=3, stride=r`` relies on negative padding; kernel
    ``2r`` keeps identical rates with sane shapes)."""
    in_size: int
    data_size: int
    ratios: Sequence[int] = (4, 4, 4)
    noise_bands: int = 5
    ss: StreamSetup = StreamSetup()

    @nn.compact
    def __call__(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        channels = [self.in_size] * len(self.ratios) + \
            [self.data_size * self.noise_bands]
        ss = dataclasses.replace(self.ss, mode="causal")
        for i, r in enumerate(self.ratios):
            x = Conv1d(features=channels[i + 1], kernel_size=2 * r, stride=r,
                       ss=ss)(x)
            if i != len(self.ratios) - 1:
                x = Activation("leaky_relu")(x)
        amp = mod_sigmoid(x - 5.0)
        B, Tp, _ = amp.shape
        amp = amp.reshape(B, Tp, self.data_size, self.noise_bands)
        target = 1
        for r in self.ratios:
            target *= r
        ir = amp_to_impulse_response(amp, target)
        noise = jax.random.uniform(rng, ir.shape, ir.dtype, -1.0, 1.0)
        out = fft_convolve(noise, ir)
        return out.transpose(0, 1, 3, 2).reshape(B, Tp * target, self.data_size)


class GeneratorV1(nn.Module):
    """v1 decoder with 3-branch synthesis head (reference ``Generator``,
    ``rave/blocks.py:321-419``)."""
    latent_size: int
    capacity: int
    data_size: int
    ratios: Sequence[int]
    loud_stride: int = 1
    use_noise: bool = True
    kernel_sizes: Sequence[int] = (3,)
    dilations_list: Sequence[Sequence[int]] = ((1, 1), (3, 1), (5, 1))
    activation: str = "leaky_relu"
    weight_norm: bool = True
    ss: StreamSetup = StreamSetup()

    def _body_delay(self) -> int:
        mode = self.ss.mode
        d = conv_delay(7, 1, 1, mode)
        for r in self.ratios:
            d = upsample_delay(r, mode, d)
            d += max(residual_block_delay(k, self.dilations_list, mode)
                     for k in self.kernel_sizes)
        return d

    @property
    def out_delay(self) -> int:
        mode = self.ss.mode
        d = self._body_delay()
        wave_d = conv_delay(7, 1, 1, mode, d)
        loud_d = conv_delay(2 * self.loud_stride + 1, self.loud_stride, 1,
                            mode, d)
        return max(wave_d, loud_d * self.loud_stride)

    @nn.compact
    def __call__(self, x: jax.Array, rng: Optional[jax.Array] = None,
                 warmed_up: Union[bool, jax.Array] = True) -> jax.Array:
        out_dim = 2 ** len(self.ratios) * self.capacity
        x = Conv1d(features=out_dim, kernel_size=7,
                   weight_norm=self.weight_norm, ss=self.ss)(x)
        d = conv_delay(7, 1, 1, self.ss.mode)
        for i, r in enumerate(self.ratios):
            in_dim = 2 ** (len(self.ratios) - i) * self.capacity
            out_dim = 2 ** (len(self.ratios) - i - 1) * self.capacity
            up = UpsampleLayer(in_dim=in_dim, out_dim=out_dim, ratio=r,
                               activation=self.activation,
                               weight_norm=self.weight_norm,
                               in_delay=d, ss=self.ss)
            x = up(x)
            d = up.out_delay
            stack = ResidualStack(dim=out_dim, kernel_sizes=self.kernel_sizes,
                                  dilations_list=self.dilations_list,
                                  activation=self.activation,
                                  weight_norm=self.weight_norm, ss=self.ss)
            x = stack(x)
            d += stack.out_delay

        # 3-branch synthesis, delay aligned (reference rave/blocks.py:368-393)
        wave_conv = Conv1d(features=self.data_size, kernel_size=7,
                           weight_norm=self.weight_norm, in_delay=d, ss=self.ss)
        loud_conv = Conv1d(features=1, kernel_size=2 * self.loud_stride + 1,
                           stride=self.loud_stride,
                           weight_norm=self.weight_norm, in_delay=d, ss=self.ss)
        waveform = wave_conv(x)
        loudness = loud_conv(x)
        if self.loud_stride != 1:
            loudness = jnp.repeat(loudness, self.loud_stride, axis=1)
        wave_d = wave_conv.out_delay
        loud_d = loud_conv.out_delay * self.loud_stride
        md = max(wave_d, loud_d)
        waveform = Delay(frames=md - wave_d, ss=self.ss)(waveform)
        loudness = Delay(frames=md - loud_d, ss=self.ss)(loudness)

        y = jnp.tanh(waveform) * mod_sigmoid(loudness)

        if self.use_noise:
            if rng is None:
                rng = self.make_rng("noise")
            noise = NoiseGeneratorV1(in_size=x.shape[-1],
                                     data_size=self.data_size,
                                     ss=self.ss)(x, rng)
            gate = jnp.asarray(warmed_up, y.dtype)
            y = y + gate * noise
        return y


# ----------------------------------------------------------------------
# hybrid mel-spectrogram front end (streaming-capable)
# ----------------------------------------------------------------------

def mel_front_delay(n_fft: int, hop: int) -> int:
    """Streaming delay of the centered mel front end, in mel frames.

    A centered frame at position ``k*hop`` needs ``L = n_fft - n_fft//2``
    samples of lookahead; emitting frames only once their window is fully
    received delays the stream by ``ceil(L/hop) - 1`` frames (the current
    chunk itself supplies one hop of lookahead)."""
    L = n_fft - n_fft // 2
    return -(-L // hop) - 1


class MelFrontEnd(nn.Module):
    """Log1p mel-spectrogram encoder front end (reference hybrid preset:
    ``torchaudio.transforms.MelSpectrogram`` + ``[..., :-1]`` + ``log1p``,
    ``rave/blocks.py:528-531,591-596``, ``configs/hybrid.gin``).

    Matches torchaudio semantics: periodic hann, center=True reflect
    padding, ``normalized=True`` (divide by sqrt(sum(win^2))), POWER
    spectrogram (torchaudio default power=2.0), and the htk/no-norm mel
    filterbank torchaudio defaults to (``configs/hybrid.gin`` sets
    neither knob; the loss-side mel option keeps librosa's
    slaney/slaney to match the reference's ``MelScale``).

    Streaming (which the reference does NOT support -- its cached_conv
    machinery cannot cache the Spectrogram): a carried sample cache of
    ``D*hop + n_fft//2`` samples reproduces the offline frames exactly,
    delayed by ``D = mel_front_delay(n_fft, hop)`` mel frames; the
    encoder folds ``D`` in via its ``in_delay``.  The only offline/
    streaming difference is the clip head: offline reflect-pads the
    first ``n_fft//2`` samples, streaming starts from a zero cache
    (zeros == what the conv stack assumes everywhere else).
    """
    n_fft: int
    hop: int
    n_mels: int
    sample_rate: int
    ss: StreamSetup = StreamSetup()

    @property
    def out_delay(self) -> int:
        return mel_front_delay(self.n_fft, self.hop) if self.ss.streaming \
            else 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """Audio (B, T) -> (B, T//hop, n_mels) log1p power-mel."""
        import numpy as np
        from ..ops.stft import frame_signal, hann_window, mel_filterbank
        n_fft, hop = self.n_fft, self.hop
        win_np = hann_window(n_fft)
        win = jnp.asarray(win_np)
        norm = float(np.sqrt(np.sum(win_np.astype(np.float64) ** 2)))
        mel = jnp.asarray(mel_filterbank(self.sample_rate, n_fft,
                                         self.n_mels, htk=True, norm=None))
        P = n_fft // 2
        if self.ss.streaming:
            D = mel_front_delay(n_fft, hop)
            S = D * hop + P
            cache = self.variable(
                "cache", "ctx",
                lambda: jnp.zeros((x.shape[0], S), jnp.float32))
            buf = jnp.concatenate(
                [cache.value.astype(x.dtype), x], axis=1)
            cache.value = buf[:, buf.shape[1] - S:].astype(jnp.float32)
            frames = frame_signal(buf, n_fft, hop)
            # exactly chunk//hop frames, each starting at m*hop in buf ==
            # offline frame (global - D) centered at (k*hop)
            frames = frames[:, : x.shape[1] // hop]
        else:
            xp = jnp.pad(x, ((0, 0), (P, P)), mode="reflect")
            frames = frame_signal(xp, n_fft, hop)
            # torchaudio emits T//hop + 1 frames; the reference drops the
            # last ([..., :-1]) == keeping [0, T//hop)
            frames = frames[:, : x.shape[1] // hop]
        spec = jnp.fft.rfft((frames * win).astype(jnp.float32), axis=-1)
        power = (jnp.abs(spec) / norm) ** 2
        m = power @ mel.T
        return jnp.log1p(m).astype(x.dtype)
