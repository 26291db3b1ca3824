"""Discriminator zoo.

Covers every discriminator family in the reference:

* generic ``ConvNet`` 1d/2d + ``MultiScaleDiscriminator`` + spectral
  variants + RAVE-style ``MultiPeriodDiscriminator`` + ``Combine``
  (reference ``rave/discriminator.py``),
* the fork's active UnivNet MRD+MPD pair (``rave/mpd.py``, ``rave/mrd.py``,
  ``rave/my_discriminator.py``),
* the MelGAN-style ``StackDiscriminators`` (reference
  ``rave/blocks.py:965-1020``),
* the DAC ``DescriptDiscriminator`` (reference
  ``rave/descript_discriminator.py``).

All are training-time only (no streaming state), layout ``(B, T, C)`` /
``(B, H, W, C)``, weight-normalised convs, LeakyReLU activations.  Every
module returns ``list[list[Array]]``: one feature list per
sub-discriminator, score last -- the convention of the reference
(``discriminator.py:110-113``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from flax import struct

from ..ops.stft import stft
from ..ops.pqmf import kaiser_filter


# ----------------------------------------------------------------------
# Phase-decomposed data gradient for strided small-channel 1D convs.
#
# XLA lowers the dx of a strided conv as a conv with lhs_dilation (the
# cotangent zero-stuffed by the stride), which on TPU runs at 12-17 GB/s
# for the MelGAN ladder's early layers (measured: stack0's (41, 16, 64,
# s=4) dx = 4.9 ms isolated vs a 0.11 ms FLOP roofline).  The identity
#   dx[s*u + p] = sum_m g[u + c(p) - m] * w[s*m + r(p)]
# re-expresses dx as ONE dense stride-1 conv emitting (phase, ci)
# channels -- and because the channels come out phase-major, the final
# interleave is a pure reshape, not a transpose (the transpose is what
# sank the round-3 probe of this idea).  Measured: 4.9 -> 1.8 ms on the
# stack0 shape.  Only the dx rule changes; fwd and dw stay native XLA.
# ----------------------------------------------------------------------

def _phase_dx_kernel(w: jax.Array, stride: int, pad_left: int):
    """Static phase-tap table + the (M, co, s*ci) stride-1 dx kernel."""
    k, ci, co = w.shape
    s = stride
    rs = [(p + pad_left) % s for p in range(s)]
    cs = [(p + pad_left - rs[p]) // s for p in range(s)]
    ms = [len(range(rs[p], k, s)) for p in range(s)]
    cmax = max(cs)
    M = max(m + (cmax - c) for m, c in zip(ms, cs))
    K = np.full((M, s), k, np.int32)
    for p in range(s):
        for m, kt in enumerate(range(rs[p], k, s)):
            K[m + (cmax - cs[p]), p] = kt
    w_ext = jnp.concatenate([w, jnp.zeros((1, ci, co), w.dtype)], 0)
    wp = w_ext[jnp.asarray(K)]                       # (M, s, ci, co)
    wp = wp.transpose(0, 3, 1, 2).reshape(M, co, s * ci)
    return wp[::-1], M, cmax


def _phase_dx(g: jax.Array, w: jax.Array, stride: int, pad_left: int,
              T: int) -> jax.Array:
    B, To, co = g.shape
    k, ci, _ = w.shape
    wr, M, cmax = _phase_dx_kernel(w, stride, pad_left)
    pl = (M - 1) - cmax
    y = jax.lax.conv_general_dilated(
        g, wr, (1,), [(pl, M - 1 - pl + (T // stride - To))],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=g.dtype)
    y = y[:, : T // stride]
    return y.reshape(B, T // stride, stride, ci).reshape(B, T, ci)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv1d_strided(x, kernel, stride, pad):
    return jax.lax.conv_general_dilated(
        x, kernel, (stride,), [pad],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)


def _conv1d_strided_fwd(x, kernel, stride, pad):
    return _conv1d_strided(x, kernel, stride, pad), (x, kernel)


def _conv1d_strided_bwd(stride, pad, res, g):
    x, kernel = res
    # dw: XLA's native rule is fine (it is dx that hits the
    # lhs_dilation pathology); reuse it via vjp on the kernel alone
    _, dw_fn = jax.vjp(lambda w: jax.lax.conv_general_dilated(
        x, w, (stride,), [pad],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype), kernel)
    (dw,) = dw_fn(g)
    # T % stride == 0 is guaranteed by the gate in WNConv
    dx = _phase_dx(g, kernel, stride, pad[0], x.shape[1])
    return dx, dw


_conv1d_strided.defvjp(_conv1d_strided_fwd, _conv1d_strided_bwd)


# ----------------------------------------------------------------------
# Shift-and-add formulation for SINGLE-input-channel 1D convs (the
# MelGAN/MSD head: k=15, 1 -> 16, stride 1).  With ci=1 the MXU has
# nothing to contract, and XLA's conv runs ~25x off the HBM floor
# (measured 2.7 ms fwd / 3.8 ms dx at (16, 131072) vs a ~0.1 ms floor).
# As k fused shifted broadcast-MACs (fwd) / k shifted matvecs (dx) XLA
# keeps everything in one pass over the big operand: measured 0.41 ms
# fwd / 1.8 ms dx.  dw keeps XLA's native rule (already fast).
# ----------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv1d_ci1(x, kernel, pad):
    """x (B, T, 1), kernel (k, 1, co), pad (pl, pr) with pl+pr == k-1
    (same-length output)."""
    k, _, co = kernel.shape
    B, T, _ = x.shape
    xp = jnp.pad(x[..., 0], ((0, 0), pad))
    y = jnp.zeros((B, T, co), x.dtype)
    for kt in range(k):
        y = y + xp[:, kt:kt + T, None] * kernel[kt, 0]
    return y


def _conv1d_ci1_fwd(x, kernel, pad):
    return _conv1d_ci1(x, kernel, pad), (x, kernel)


def _conv1d_ci1_bwd(pad, res, g):
    x, kernel = res
    k = kernel.shape[0]
    B, T, _ = x.shape
    pl, pr = pad
    # dx[t] = sum_kt g[t - kt + pl] . kernel[kt]
    gp = jnp.pad(g, ((0, 0), (pr, pl), (0, 0)))
    dx = jnp.zeros((B, T), x.dtype)
    for kt in range(k):
        dx = dx + gp[:, k - 1 - kt:k - 1 - kt + T, :] @ kernel[kt, 0]
    _, dw_fn = jax.vjp(lambda w: jax.lax.conv_general_dilated(
        x, w, (1,), [pad], dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype), kernel)
    (dw,) = dw_fn(g)
    return dx[..., None], dw


_conv1d_ci1.defvjp(_conv1d_ci1_fwd, _conv1d_ci1_bwd)


def _ci1_pallas_enabled() -> bool:
    """Dispatch gate for the Pallas ci=1 head-conv stencil
    (``RAVE_TPU_CI1_PALLAS=1`` opts in).  Off by default: correctness is
    interpret-mode verified, but the Mosaic lowering is still being
    qualified on the tunnelled toolchain (first on-TPU compile attempt
    SIGABRT'd the remote tpu_compile_helper)."""
    import os
    return os.environ.get("RAVE_TPU_CI1_PALLAS", "") == "1" \
        and jax.devices()[0].platform in ("tpu", "axon")


def _wn_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class WNConv(nn.Module):
    """Weight-normalised N-d conv (N = len(kernel_size)), NHWC layouts."""
    features: int
    kernel_size: Sequence[int]
    strides: Optional[Sequence[int]] = None
    padding: Optional[Sequence[tuple]] = None  # [(l, r), ...] per spatial dim
    groups: int = 1
    dilation: Optional[Sequence[int]] = None
    use_bias: bool = True
    weight_norm: bool = True
    # "conv": normal behaviour.  "kernel": return the materialised
    # (kernel, bias) instead of convolving -- used by the packed-resident
    # spectral-disc chain, which owns the conv itself.  Parameter names
    # and shapes are identical in both modes (checkpoint compatible).
    mode: str = "conv"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        nd = len(self.kernel_size)
        in_ch = x.shape[-1]
        kshape = (*self.kernel_size, in_ch // self.groups, self.features)
        fan_in = in_ch // self.groups * int(np.prod(self.kernel_size))
        if self.weight_norm:
            v = self.param("v", _wn_init(fan_in), kshape)
            g = self.param("g", lambda *_: jnp.sqrt(jnp.sum(
                jnp.square(v), axis=tuple(range(nd + 1)), keepdims=True)),
                           (1,) * (nd + 1) + (self.features,))
            norm = jnp.sqrt(jnp.sum(jnp.square(v),
                                    axis=tuple(range(nd + 1)),
                                    keepdims=True) + 1e-12)
            kernel = v * (g / norm)
        else:
            kernel = self.param("kernel", _wn_init(fan_in), kshape)

        dn_spatial = "".join("WH"[: nd]) if nd <= 2 else None
        spec = ("NWC", "WIO", "NWC") if nd == 1 else ("NHWC", "HWIO", "NHWC")
        strides = tuple(self.strides or (1,) * nd)
        padding = self.padding
        if padding is None:
            padding = [((k - 1) // 2, (k - 1) // 2) for k in self.kernel_size]
        # compute in the INPUT dtype (params stay f32): casting x up to
        # f32 instead silently disabled bf16 for every discriminator
        dtype = x.dtype
        dilation = tuple(self.dilation or (1,) * nd)
        bias = (self.param("bias", _wn_init(fan_in), (self.features,))
                if self.use_bias else None)
        if self.mode == "kernel":
            return (kernel.astype(dtype),
                    None if bias is None else bias.astype(dtype))
        groups = self.groups
        kernel = kernel.astype(dtype)
        if groups > 1:
            # SUPERGROUPING: XLA's grouped-conv lowering splits the
            # channel axis into (groups, ch/group) with ch/group as the
            # minor dim -- at the MelGAN ladder's 4-channel groups that
            # is a T(4,128) tiling using 4 of 128 lanes, measured at
            # ~17 GB/s / <1% MXU in the v2_fork step.  Merging groups
            # into supergroups of ~128 output channels with an exact
            # block-diagonal kernel trades <=8x redundant FLOPs (still
            # far below the MXU floor) for full-lane tiling: the
            # stack0-shaped fwd+bwd probe ran 1.75-2.5x faster
            # (docs/benchmarks.md round 3).
            og = self.features // groups
            sgf = max(1, min(groups, 128 // max(og, 1)))
            # sgf must DIVIDE groups or the block-diagonal expansion
            # below breaks XLA's grouped-conv channel equation (latent
            # for non-power-of-two configs, e.g. groups=6/og=30 -> 4)
            while groups % sgf:
                sgf -= 1
            if sgf > 1:
                nd_k = kernel.ndim - 2
                cg = kernel.shape[-2]
                o = np.arange(self.features)
                mask = ((o[None, :] // og) % sgf
                        == np.arange(sgf)[:, None]).astype(np.float32)
                m = jnp.asarray(mask, dtype)                 # (sgf, Co)
                kernel = (kernel[..., None, :, :] * m[:, None, :]) \
                    .reshape(*kernel.shape[:nd_k], sgf * cg, self.features)
                groups = groups // sgf
        T = x.shape[1]
        out_len = ((T + padding[0][0] + padding[0][1]
                    - ((self.kernel_size[0] - 1) * dilation[0] + 1))
                   // strides[0] + 1) if nd == 1 else None
        # NOTE: a shift-and-add path for the 1-input-channel head conv
        # (_conv1d_ci1) won 6.6x fwd / 2.1x dx ISOLATED but cost the
        # whole fork step +36 ms in-graph (153 vs 117.5 ms) -- the k
        # explicit shifted adds break XLA's surrounding fusions.  Kept
        # implemented+tested but NOT dispatched (docs/speed_of_light.md
        # ledger).  The round-5 Pallas stencil below (ci1_conv.py) is the
        # formulation that owns its own memory traffic instead.
        if (nd == 1 and groups == 1 and strides[0] == 1
                and dilation[0] == 1 and in_ch == 1
                and self.kernel_size[0] <= 16 and T >= 8192
                and padding[0][0] + padding[0][1] == self.kernel_size[0] - 1
                and _ci1_pallas_enabled()):
            # the MelGAN/MSD head conv (k=15, 1->16): time-on-lanes
            # Pallas stencil for fwd + dx (ops/pallas/ci1_conv.py)
            from ..ops.pallas.ci1_conv import conv1d_ci1_pallas
            y = conv1d_ci1_pallas(x, kernel, tuple(padding[0]))
        elif (nd == 1 and groups == 1 and strides[0] > 1
                and dilation[0] == 1 and kernel.shape[1] <= 32
                and T % strides[0] == 0 and out_len == T // strides[0]):
            # strided small-channel 1D conv: custom phase-decomposed dx
            # (see _conv1d_strided) -- the MelGAN ladder's early layers,
            # whose native dx runs 25-45x off roofline
            y = _conv1d_strided(x, kernel, strides[0], tuple(padding[0]))
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel,
                window_strides=strides,
                padding=list(padding),
                rhs_dilation=dilation,
                dimension_numbers=spec,
                feature_group_count=groups,
                preferred_element_type=dtype,
            )
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


# ----------------------------------------------------------------------
# Packed-resident spectral-disc chain.
#
# The Encodec spectral discriminator's 2D convs have 2/32-channel dims
# that tile at 3-25% MXU (lane width 128) and, formulated natively, every
# layer pays pad + layout-copy + slice HBM round trips.  Here p frequency
# rows are folded into channels ONCE and every layer consumes/produces
# the packed layout directly: activation traffic is one read + one write
# per layer, and channel dims are p*Ci / (p/stride)*Co.  Semantics are
# identical to the native convs (the ph zero-padding is folded into the
# regrouped kernel taps, and out-of-range rows are kept at exact zero by
# a fused static mask).
# ----------------------------------------------------------------------

class PackedFeature(struct.PyTreeNode):
    """A feature map in packed layout: ``data`` is (B, nb, T, pout*Co)
    where channel slot q of block j holds F-row ``j*pout + q - offset``;
    slots outside [offset, offset + valid_rows) are exact zeros.
    ``mean |a-b|`` style reductions over it equal the native ones up to
    the static ``valid_frac()``."""
    data: jax.Array
    valid_rows: int = struct.field(pytree_node=False)
    pout: int = struct.field(pytree_node=False)
    offset: int = struct.field(pytree_node=False, default=0)

    @property
    def shape(self):
        return self.data.shape

    def valid_frac(self) -> float:
        nb = self.data.shape[1]
        return self.valid_rows / float(nb * self.pout)

    def unpack(self) -> jax.Array:
        """Back to native (B, F, T, Co) layout (tests / inspection)."""
        B, nb, T, pc = self.data.shape
        co = pc // self.pout
        y = self.data.reshape(B, nb, T, self.pout, co)
        y = y.transpose(0, 1, 3, 2, 4).reshape(B, nb * self.pout, T, co)
        return y[:, self.offset:self.offset + self.valid_rows]


def pack_rows(z: jax.Array, p: int) -> jax.Array:
    """(B, F, T, C) -> (B, ceil(F/p), T, p*C), zero rows beyond F."""
    B, F, T, C = z.shape
    nb = -(-F // p)
    zp = jnp.pad(z, ((0, 0), (0, nb * p - F), (0, 0), (0, 0)))
    zp = zp.reshape(B, nb, p, T, C).transpose(0, 1, 3, 2, 4)
    return zp.reshape(B, nb, T, p * C)


def _chain_taps(p, pout, sh, kh, ph, o_in):
    """Pick the output front-offset o_out in [0, p) that minimises the
    block-tap count, then the tap (kb) range.  Tap index for output
    slot-in-block q reading input block j+kb slot r is
    ``dh = kb*p + r - q*sh + c`` with ``c = ph + o_out*sh - o_in``; the
    offset only moves the alignment of dh mod p, so a good o_out saves
    a whole tap (33% of the conv FLOPs at the hot layers)."""
    best = None
    span = kh + ph + p * sh + o_in + 4   # generous search window
    lo, hi = -span, span
    for o_out in range(p):
        c = ph + o_out * sh - o_in
        kbs = [kb for kb in range(lo, hi + 1)
               if np.any((kb * p + np.arange(p)[:, None]
                          - np.arange(pout)[None, :] * sh + c >= 0)
                         & (kb * p + np.arange(p)[:, None]
                            - np.arange(pout)[None, :] * sh + c < kh))]
        # a tap at the search boundary would mean the window clipped the
        # true range and taps were silently dropped
        assert lo < min(kbs) and max(kbs) < hi, (kbs, lo, hi)
        kb_lo, kb_hi = min(min(kbs), 0), max(kbs)
        taps = kb_hi - kb_lo + 1
        if best is None or (taps, o_out) < (best[0], best[1]):
            best = (taps, o_out, kb_lo, kb_hi, c)
    return best[1], best[2], best[3], best[4]


def _packed_chain_layer(a: jax.Array, kernel: jax.Array,
                        bias: Optional[jax.Array], p: int, F: int,
                        o_in: int, sh: int, dw: int, ph: int, pw: int,
                        lrelu_slope: Optional[float]):
    """One spectral-disc layer entirely in packed layout.

    ``a``: (B, nb, T, p*Ci) with valid rows at slots [o_in, o_in+F)
    (rest exact zero); ``kernel``: native (kh, kw, Ci, Co).  Equals the
    native conv with strides (sh, 1), dilation (1, dw), padding
    ((ph, ph), (pw, pw)), followed by bias, leaky-relu (if slope given)
    and zeroing of the out-of-range slots.  Returns (y, pout, Fo, o_out).
    """
    B, nb, T, pci = a.shape
    kh, kw, Ci, Co = kernel.shape
    assert pci == p * Ci and p % sh == 0, (pci, p, Ci, sh)
    pout = p // sh
    Fo = (F + 2 * ph - kh) // sh + 1
    o_out, kb_lo, kb_hi, c = _chain_taps(p, pout, sh, kh, ph, o_in)
    nb_out = -(-(Fo + o_out) // pout)
    taps = kb_hi - kb_lo + 1

    kbi = np.arange(kb_lo, kb_hi + 1)[:, None, None]
    r = np.arange(p)[None, :, None]
    q = np.arange(pout)[None, None, :]
    dh = kbi * p + r - q * sh + c                   # (taps, p, pout)
    onehot = (dh[..., None] == np.arange(kh)).astype(kernel.dtype)
    wg = jnp.einsum("bpqk,kwio->bpqwio", jnp.asarray(onehot), kernel)
    wp = wg.transpose(0, 3, 1, 4, 2, 5).reshape(taps, kw, p * Ci,
                                                pout * Co)

    pl = -kb_lo
    pr = nb_out - 1 + kb_hi - (nb - 1)
    assert pr >= 0, (pr, nb, nb_out, kb_hi)
    y = jax.lax.conv_general_dilated(
        a, wp, (1, 1), padding=[(pl, pr), (pw, pw)],
        rhs_dilation=(1, dw), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=a.dtype)
    if bias is not None:
        y = y + jnp.tile(bias, pout)
    if lrelu_slope is not None:
        y = nn.leaky_relu(y, lrelu_slope)
    if o_out > 0 or nb_out * pout != Fo + o_out:
        s = np.arange(nb_out * pout).reshape(nb_out, pout)
        rows = (s >= o_out) & (s < o_out + Fo)
        mask = np.repeat(rows, Co, axis=1)[None, :, None, :]
        y = y * jnp.asarray(mask, dtype=y.dtype)
    return y, pout, Fo, o_out


def _avg_pool_1d(x: jax.Array, window: int = 2) -> jax.Array:
    """(B, T, C) average pool, torch ``avg_pool1d`` semantics."""
    T = x.shape[1] - x.shape[1] % window
    x = x[:, :T]
    return x.reshape(x.shape[0], T // window, window, x.shape[2]).mean(2)


# ----------------------------------------------------------------------
# Generic ConvNet ladder (reference rave/discriminator.py:77-113)
# ----------------------------------------------------------------------

class ConvNet1d(nn.Module):
    in_size: int = 1
    out_size: int = 1
    capacity: int = 64
    n_layers: int = 4
    kernel_size: int = 15
    stride: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        feats = []
        channels = [self.capacity * 2 ** i for i in range(self.n_layers)]
        for i in range(self.n_layers):
            ke = self.kernel_size
            pad = (ke - self.stride + 1) // 2 if ke > 1 else 0
            x = WNConv(features=channels[i], kernel_size=(ke,),
                       strides=(self.stride,), padding=[(pad, pad)])(x)
            feats.append(x)
            x = nn.leaky_relu(x, 0.2)
        x = WNConv(features=self.out_size, kernel_size=(1,))(x)
        feats.append(x)
        return feats


class ConvNet2d(nn.Module):
    """2D variant used by the period discriminators (kernel (5, 1))."""
    in_size: int = 1
    out_size: int = 1
    capacity: int = 64
    n_layers: int = 4
    kernel_size: Sequence[int] = (5, 1)
    stride: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        feats = []
        for i in range(self.n_layers):
            kh, kw = self.kernel_size
            pad_h = (kh - self.stride + 1) // 2 if kh > 1 else 0
            x = WNConv(features=self.capacity * 2 ** i,
                       kernel_size=(kh, kw),
                       strides=(self.stride, 1),
                       padding=[(pad_h, pad_h), (0, 0)])(x)
            feats.append(x)
            x = nn.leaky_relu(x, 0.2)
        x = WNConv(features=self.out_size, kernel_size=(1, 1))(x)
        feats.append(x)
        return feats


class MultiScaleDiscriminator(nn.Module):
    """3 ConvNets over an avg-pool pyramid (reference
    ``discriminator.py:116-136``)."""
    n_discriminators: int = 3
    capacity: int = 64
    n_layers: int = 4
    kernel_size: int = 15
    stride: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> list[list[jax.Array]]:
        out = []
        for i in range(self.n_discriminators):
            out.append(ConvNet1d(capacity=self.capacity,
                                 n_layers=self.n_layers,
                                 kernel_size=self.kernel_size,
                                 stride=self.stride, name=f"disc{i}")(x))
            x = _avg_pool_1d(x, 2)
        return out


class EncodecConvNet(nn.Module):
    """2D conv stack over complex STFT (reference
    ``discriminator.py:54-74``).

    ``packed=True`` (default) runs the whole stack in packed-resident
    layout (see ``_packed_chain_layer``): frequency rows folded into
    channels once, each layer one conv + fused elementwise, no per-layer
    layout round trips.  Parameters are identical to the native
    formulation; features come back as ``PackedFeature`` where the
    layout differs (``.unpack()`` recovers the native map; masked-mean
    reductions are exact up to the static ``valid_frac``).
    """
    capacity: int = 32
    packed: bool = True

    SPECS = (
        # (kh, kw, stride_f, dil_t)
        (9, 3, 1, 1),
        (9, 3, 2, 1),
        (9, 3, 2, 2),
        (9, 3, 2, 4),
        (3, 3, 1, 1),
    )

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        # x: (B, F, T, 2)
        feats = []
        if self.packed:
            p, F, o = 8, x.shape[1], 0
            a = pack_rows(x, p)
            ci = x.shape[-1]
            for i, (kh, kw, sh, dw) in enumerate(self.SPECS):
                ph, pw = (kh - 1) // 2, (kw - 1) * dw // 2
                # dummy carries the NATIVE in-channel count so parameter
                # shapes/names match the unpacked formulation exactly
                dummy = jnp.zeros((1, 1, 1, ci), x.dtype)
                w, b = WNConv(features=self.capacity, kernel_size=(kh, kw),
                              strides=(sh, 1), dilation=(1, dw),
                              padding=[(ph, ph), (pw, pw)],
                              mode="kernel")(dummy)
                a, p, F, o = _packed_chain_layer(a, w, b, p, F, o, sh, dw,
                                                 ph, pw, lrelu_slope=0.2)
                feats.append(a if p == 1 and o == 0
                             else PackedFeature(a, valid_rows=F, pout=p,
                                                offset=o))
                ci = self.capacity
            dummy = jnp.zeros((1, 1, 1, ci), x.dtype)
            w, b = WNConv(features=1, kernel_size=(3, 3),
                          padding=[(1, 1), (1, 1)], mode="kernel")(dummy)
            a, p, F, o = _packed_chain_layer(a, w, b, p, F, o, 1, 1, 1, 1,
                                             lrelu_slope=None)
            assert p == 1 and o == 0
            feats.append(a)
            return feats
        for i, (kh, kw, sh, dw) in enumerate(self.SPECS):
            ph, pw = (kh - 1) // 2, (kw - 1) * dw // 2
            x = WNConv(features=self.capacity, kernel_size=(kh, kw),
                       strides=(sh, 1), dilation=(1, dw),
                       padding=[(ph, ph), (pw, pw)])(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
        x = WNConv(features=1, kernel_size=(3, 3),
                   padding=[(1, 1), (1, 1)])(x)
        feats.append(x)
        return feats


class MultiScaleSpectralDiscriminator(nn.Module):
    """EncodecConvNets over multiple STFT scales (reference
    ``discriminator.py:139-155``)."""
    scales: Sequence[int] = (4096, 2048, 1024, 512, 256)
    capacity: int = 32
    packed: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> list[list[jax.Array]]:
        # x: (B, T, 1) audio
        sig = x[..., 0]
        out = []
        for i, scale in enumerate(self.scales):
            if sig.shape[1] < scale:
                # center=False (reference discriminator.py:12-20): a
                # signal shorter than the window yields ZERO frames and
                # the empty-mean would silently train on NaN
                raise ValueError(
                    f"spectral discriminator scale {scale} needs at "
                    f"least {scale} samples, got {sig.shape[1]} (reduce "
                    f"discriminator.spectral_scales or raise n_signal)")
            s = stft(sig, scale, scale // 4, center=False, normalized=True)
            # (B, frames, bins) complex -> (B, bins, frames, 2).
            # The FFT itself runs f32 (ops/stft.py); cast back so the
            # conv chain runs in the compute dtype -- without this the
            # whole Encodec stack silently upcast to f32 under bf16.
            z = jnp.stack([s.real, s.imag], -1).transpose(0, 2, 1, 3)
            z = z.astype(sig.dtype)
            out.append(EncodecConvNet(capacity=self.capacity,
                                      packed=self.packed,
                                      name=f"spec{i}")(z))
        return out


class MultiScaleSpectralDiscriminator1d(nn.Module):
    """1d variant of the multi-scale spectral discriminator (reference
    ``discriminator.py:156-170``): the complex STFT bins become 1d-conv
    CHANNELS (``n + 2`` = real+imag of ``n/2 + 1`` bins) and a strided
    1d ConvNet runs over the frame axis (``configs/v2.gin:65-78``:
    kernel 5, stride 2).  Bound in v2.gin but not a member of its active
    combine (v2.gin:86-91) -- a dead-config leaf in the reference,
    implemented for completeness and selectable here via the
    ``spectral_1d`` combine member."""
    scales: Sequence[int] = (4096, 2048, 1024, 512, 256)
    capacity: int = 64
    n_layers: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> list[list[jax.Array]]:
        sig = x[..., 0]
        out = []
        for i, scale in enumerate(self.scales):
            if sig.shape[1] < scale:
                raise ValueError(
                    f"spectral_1d discriminator scale {scale} needs at "
                    f"least {scale} samples, got {sig.shape[1]} (reduce "
                    f"discriminator.spectral_scales or raise n_signal)")
            s = stft(sig, scale, scale // 4, center=False, normalized=True)
            # (B, frames, bins) complex -> (B, frames, n+2) channels
            z = jnp.concatenate([s.real, s.imag], -1).astype(sig.dtype)
            out.append(ConvNet1d(in_size=scale + 2,
                                 capacity=self.capacity,
                                 n_layers=self.n_layers,
                                 kernel_size=5, stride=2,
                                 name=f"spec1d{i}")(z))
        return out


class MultiPeriodDiscriminator(nn.Module):
    """RAVE-style period discriminator (reference
    ``discriminator.py:173-194``): fold time into (T/p, p), shared 2D
    ConvNet."""
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    capacity: int = 64
    n_layers: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> list[list[jax.Array]]:
        out = []
        for i, p in enumerate(self.periods):
            B, T, C = x.shape
            pad = (p - T % p) % p
            z = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            z = z.reshape(B, -1, p, C)  # (B, T/p, p, C)
            out.append(ConvNet2d(capacity=self.capacity,
                                 n_layers=self.n_layers,
                                 name=f"period{i}")(z))
        return out


# ----------------------------------------------------------------------
# UnivNet MPD / MRD -- the fork's active pair (rave/mpd.py, rave/mrd.py)
# ----------------------------------------------------------------------

class UnivNetPeriodDiscriminator(nn.Module):
    """Reference ``DiscriminatorP`` (``rave/mpd.py:6-56``)."""
    period: int

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        B, T, C = x.shape
        p = self.period
        if T % p:
            pad = p - T % p
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
            T += pad
        z = x.reshape(B, T // p, p, C)
        feats = []
        chans = [64, 128, 256, 512]
        for i, ch in enumerate(chans):
            z = WNConv(features=ch, kernel_size=(5, 1), strides=(3, 1),
                       padding=[(2, 2), (0, 0)])(z)
            z = nn.leaky_relu(z, 0.2)
            feats.append(z)
        z = WNConv(features=1024, kernel_size=(5, 1), strides=(1, 1),
                   padding=[(2, 2), (0, 0)])(z)
        z = nn.leaky_relu(z, 0.2)
        feats.append(z)
        z = WNConv(features=1, kernel_size=(3, 1), padding=[(1, 1), (0, 0)])(z)
        feats.append(z)
        return feats


class UnivNetResolutionDiscriminator(nn.Module):
    """Reference ``DiscriminatorR`` (``rave/mrd.py:8-88``).

    ``resolution`` is (hop_ms, win_ms); the reference hard-codes
    ``sampling_rate = 16000`` for the ms->samples conversion even though
    the fork feeds 44.1 kHz audio (``rave/mrd.py:14``) -- kept for parity.

    Orientation matches the reference exactly: torch.stft output is
    freq-major (B, F, T), Conv2d kernel (3, 9) = 3 taps on F / 9 on T,
    stride (1, 2) = 2 on T, padding (1, 4).  Here the spectrogram rides
    TIME-major (B, T, F, C) so the packed-resident chain (which packs
    the LEADING axis into channels and strides it) puts the 9-tap
    window and the stride-2 downsampling on the time axis, like the
    reference.  (Round-3 shipped the transpose -- 9 taps/stride on F --
    which changed the discriminator's inductive bias; flagged by the
    round-3 advisor and fixed here.)  ``packed=True`` (default) runs
    the whole stack through the same packed-resident chain as the
    Encodec discriminator (time rows folded into channels, one conv per
    layer): natively these 32-channel convs tile at <10% MXU and
    dominated the v2_fork step (132 ms of 312, profile 2026-08-20).
    """
    resolution: tuple
    sampling_rate: int = 16000
    packed: bool = True

    # (kh on T, kw on F, stride on T) -- reference mrd.py convs with
    # the torch (kF, kT) tuples transposed into this module's
    # (leading, second) axis order.  The pack size is pinned to 8 = the
    # chain's total T-stride: smaller packs break the per-layer
    # p %% stride divisibility, larger ones cannot reach p=1 by the
    # scoring layer.
    SPECS = ((9, 3, 1), (9, 3, 2), (9, 3, 2), (9, 3, 2), (3, 3, 1))

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        hop_ms, win_ms = self.resolution
        hop = int(0.001 * hop_ms * self.sampling_rate)
        win = int(0.001 * win_ms * self.sampling_rate)
        n_fft = int(2 ** (int(math.log2(win)) + 1))

        sig = x[..., 0]
        pad = (n_fft - hop) // 2
        sig = jnp.pad(sig, ((0, 0), (pad, pad)), mode="reflect")
        s = stft(sig, n_fft, hop, win_length=win, center=False)
        mag = jnp.abs(s)  # (B, frames, bins)
        z = mag[..., None].astype(sig.dtype)  # (B, T, F, 1) time-major

        feats = []
        if self.packed:
            p, F, o = 8, z.shape[1], 0
            a = pack_rows(z, p)
            ci = 1
            for i, (kh, kw, sh) in enumerate(self.SPECS):
                ph, pw = (kh - 1) // 2, (kw - 1) // 2
                dummy = jnp.zeros((1, 1, 1, ci), z.dtype)
                w, b = WNConv(features=32, kernel_size=(kh, kw),
                              strides=(sh, 1),
                              padding=[(ph, ph), (pw, pw)],
                              mode="kernel")(dummy)
                a, p, F, o = _packed_chain_layer(a, w, b, p, F, o, sh, 1,
                                                 ph, pw, lrelu_slope=0.2)
                feats.append(a if p == 1 and o == 0
                             else PackedFeature(a, valid_rows=F, pout=p,
                                                offset=o))
                ci = 32
            dummy = jnp.zeros((1, 1, 1, ci), z.dtype)
            w, b = WNConv(features=1, kernel_size=(3, 3),
                          padding=[(1, 1), (1, 1)], mode="kernel")(dummy)
            a, p, F, o = _packed_chain_layer(a, w, b, p, F, o, 1, 1, 1, 1,
                                             lrelu_slope=None)
            assert p == 1 and o == 0
            feats.append(a)
            return feats
        for kh, kw, sh in self.SPECS:
            ph, pw = (kh - 1) // 2, (kw - 1) // 2
            z = WNConv(features=32, kernel_size=(kh, kw), strides=(sh, 1),
                       padding=[(ph, ph), (pw, pw)])(z)
            z = nn.leaky_relu(z, 0.2)
            feats.append(z)
        z = WNConv(features=1, kernel_size=(3, 3), padding=[(1, 1), (1, 1)])(z)
        feats.append(z)
        return feats


class UnivNetDiscriminator(nn.Module):
    """MRD + MPD pair (reference ``NewDiscriminator``,
    ``rave/my_discriminator.py:7-14``).  Returns (fmap, score) style lists:
    one feature list per sub-discriminator, score last."""
    resolutions: Sequence[tuple] = ((5, 25), (10, 50), (2, 10))
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    packed: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> list[list[jax.Array]]:
        out = []
        for i, res in enumerate(self.resolutions):
            out.append(UnivNetResolutionDiscriminator(
                resolution=tuple(res), packed=self.packed,
                name=f"mrd{i}")(x))
        for i, p in enumerate(self.periods):
            out.append(UnivNetPeriodDiscriminator(period=p,
                                                  name=f"mpd{i}")(x))
        return out


# ----------------------------------------------------------------------
# MelGAN stack (reference rave/blocks.py:965-1020)
# ----------------------------------------------------------------------

class MelGANDiscriminator(nn.Module):
    """Reference ``Discriminator`` (``rave/blocks.py:965-1006``)."""
    capacity: int = 16
    multiplier: int = 4
    n_layers: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        feats = []
        x = WNConv(features=self.capacity, kernel_size=(15,),
                   padding=[(7, 7)])(x)
        feats.append(x)
        x = nn.leaky_relu(x, 0.2)
        for i in range(self.n_layers):
            out_ch = min(1024, self.capacity * self.multiplier ** (i + 1))
            pad = (41 - self.multiplier + 1) // 2
            x = WNConv(features=out_ch, kernel_size=(41,),
                       strides=(self.multiplier,), padding=[(pad, pad)],
                       groups=self.multiplier ** (i + 1))(x)
            feats.append(x)
            x = nn.leaky_relu(x, 0.2)
        ch = x.shape[-1]
        x = WNConv(features=ch, kernel_size=(5,), padding=[(2, 2)])(x)
        feats.append(x)
        x = nn.leaky_relu(x, 0.2)
        x = WNConv(features=1, kernel_size=(1,))(x)
        feats.append(x)
        return feats


class StackDiscriminators(nn.Module):
    """3 MelGAN discriminators over an avg-pool pyramid (reference
    ``rave/blocks.py:1009-1020``; instantiated at ``rave/model.py:183-189``
    with capacity 16, multiplier 4, 4 layers)."""
    n_dis: int = 3
    capacity: int = 16
    multiplier: int = 4
    n_layers: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> list[list[jax.Array]]:
        out = []
        for i in range(self.n_dis):
            out.append(MelGANDiscriminator(
                capacity=self.capacity, multiplier=self.multiplier,
                n_layers=self.n_layers, name=f"stack{i}")(x))
            x = _avg_pool_1d(x, 2)
        return out


# ----------------------------------------------------------------------
# Descript (DAC) discriminator (reference rave/descript_discriminator.py)
# ----------------------------------------------------------------------

DESCRIPT_BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))


class DescriptMPD(nn.Module):
    """Reference ``MPD`` (``descript_discriminator.py:30-66``)."""
    period: int

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        B, T, C = x.shape
        p = self.period
        pad = (p - T % p) % p
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        z = x.reshape(B, -1, p, C)
        feats = []
        for ch in (32, 128, 512, 1024):
            z = WNConv(features=ch, kernel_size=(5, 1), strides=(3, 1),
                       padding=[(2, 2), (0, 0)])(z)
            z = nn.leaky_relu(z, 0.1)
            feats.append(z)
        z = WNConv(features=1024, kernel_size=(5, 1),
                   padding=[(2, 2), (0, 0)])(z)
        z = nn.leaky_relu(z, 0.1)
        feats.append(z)
        z = WNConv(features=1, kernel_size=(3, 1), padding=[(1, 1), (0, 0)])(z)
        feats.append(z)
        return feats


class DescriptMSD(nn.Module):
    """Reference ``MSD`` (``descript_discriminator.py:69-112``): kaiser
    anti-aliased downsample + grouped conv ladder."""
    scale: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        if self.scale != 1:
            filt = kaiser_filter(np.pi / self.scale, 140)
            if not len(filt) % 2:
                filt = np.pad(filt, (1, 0))
            w = jnp.asarray(filt, x.dtype).reshape(-1, 1, 1)
            pad = len(filt) // 2
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(self.scale,), padding=[(pad, pad)],
                dimension_numbers=("NWC", "WIO", "NWC"))
        feats = []
        specs = [(16, 15, 1, 1), (64, 41, 4, 4), (256, 41, 4, 16),
                 (1024, 41, 4, 64), (1024, 41, 4, 256), (1024, 5, 1, 1)]
        for ch, k, s, g in specs:
            x = WNConv(features=ch, kernel_size=(k,), strides=(s,),
                       padding=[(k // 2, k // 2)], groups=g)(x)
            x = nn.leaky_relu(x, 0.1)
            feats.append(x)
        x = WNConv(features=1, kernel_size=(3,), padding=[(1, 1)])(x)
        feats.append(x)
        return feats


class DescriptMRD(nn.Module):
    """Reference ``MRD`` (``descript_discriminator.py:118-183``):
    band-split complex STFT + per-band 2D conv stacks.

    The band convs are (3, 9) kernels with stride (1, 2): 9 taps and the
    downsampling along FREQUENCY, total F-stride 8 across the chain --
    exactly the packed-resident shape (see ``_packed_chain_layer``).
    ``packed=True`` (default) runs each band freq-major through the
    packed chain (native per-band convs measured 43-70 GB/s and
    dominated the v3 step).  Parameters are identical to the native
    formulation (the stored (3, 9, ci, co) kernels are transposed to
    (9, 3, ci, co) at trace time), so checkpoints are interchangeable."""
    window_length: int
    hop_factor: float = 0.25
    bands: Sequence[tuple] = DESCRIPT_BANDS
    packed: bool = True

    SPECS = (((3, 9), (1, 1)), ((3, 9), (1, 2)), ((3, 9), (1, 2)),
             ((3, 9), (1, 2)), ((3, 3), (1, 1)))

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        sig = x[..., 0]
        s = stft(sig, self.window_length,
                 int(self.hop_factor * self.window_length))
        # (B, T', F) complex -> (B, T', F, 2), back in the compute dtype
        # (the FFT itself runs f32, ops/stft.py:82)
        z = jnp.stack([s.real, s.imag], -1).astype(sig.dtype)
        n_fft = self.window_length // 2 + 1
        bands = [(int(b0 * n_fft), int(b1 * n_fft)) for b0, b1 in self.bands]

        feats = []
        outs = []
        for bi, (b0, b1) in enumerate(bands):
            band = z[:, :, b0:b1, :]
            if self.packed:
                # freq-major residency: (B, F_b, T', C), pack F rows
                a = band.transpose(0, 2, 1, 3)
                p, F, o = 8, a.shape[1], 0
                a = pack_rows(a, p)
                ci = 2
                for li, (k, st) in enumerate(self.SPECS):
                    dummy = jnp.zeros((1, 1, 1, ci), z.dtype)
                    w, b = WNConv(features=32, kernel_size=k, strides=st,
                                  padding=[((k[0] - 1) // 2,) * 2,
                                           ((k[1] - 1) // 2,) * 2],
                                  mode="kernel",
                                  name=f"band{bi}_conv{li}")(dummy)
                    # stored (kT, kF, ci, co) -> chain-major (kF, kT, ..)
                    w = w.transpose(1, 0, 2, 3)
                    kh, kw = w.shape[0], w.shape[1]
                    ph, pw = (kh - 1) // 2, (kw - 1) // 2
                    a, p, F, o = _packed_chain_layer(
                        a, w, b, p, F, o, st[1], 1, ph, pw,
                        lrelu_slope=0.1)
                    feats.append(a if p == 1 and o == 0
                                 else PackedFeature(a, valid_rows=F,
                                                   pout=p, offset=o))
                    ci = 32
                assert p == 1 and o == 0, (p, o)
                # back to native (B, T', F_b/8, 32) for the concat+post
                # (a: (B, nb>=F, T', 32) with valid F rows first)
                outs.append(a[:, :F].transpose(0, 2, 1, 3))
                continue
            for li, (k, st) in enumerate(self.SPECS):
                ph, pw = (k[0] - 1) // 2, (k[1] - 1) // 2
                band = WNConv(features=32, kernel_size=k, strides=st,
                              padding=[(ph, ph), (pw, pw)],
                              name=f"band{bi}_conv{li}")(band)
                band = nn.leaky_relu(band, 0.1)
                feats.append(band)
            outs.append(band)
        z = jnp.concatenate(outs, axis=2)
        z = WNConv(features=1, kernel_size=(3, 3),
                   padding=[(1, 1), (1, 1)], name="post")(z)
        feats.append(z)
        return feats


class DescriptDiscriminator(nn.Module):
    """Reference ``DescriptDiscriminator``
    (``descript_discriminator.py:186-215``)."""
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    rates: Sequence[int] = ()
    fft_sizes: Sequence[int] = (2048, 1024, 512)

    @nn.compact
    def __call__(self, x: jax.Array) -> list[list[jax.Array]]:
        # DC removal + peak normalisation (descript_discriminator.py:205-210).
        # Computed in f32: in bf16 the mean/peak reductions are coarse
        # enough that the backward's 1/(peak+eps)^2 rescue term blows up
        # on near-silent generator output (the whole v3 bf16 step NaN'd
        # on the FIRST generator gradient; MPD-only and MRD-only both
        # reproduced it, isolating this shared preprocess).  Two
        # elementwise passes over raw audio -- negligible next to the
        # conv stacks.
        dt = x.dtype
        x32 = x.astype(jnp.float32)
        x32 = x32 - jnp.mean(x32, axis=1, keepdims=True)
        x = (0.8 * x32 / (jnp.max(jnp.abs(x32), axis=1, keepdims=True)
                          + 1e-9)).astype(dt)
        out = []
        for i, p in enumerate(self.periods):
            out.append(DescriptMPD(period=p, name=f"mpd{i}")(x))
        for i, r in enumerate(self.rates):
            out.append(DescriptMSD(scale=r, name=f"msd{i}")(x))
        for i, f in enumerate(self.fft_sizes):
            out.append(DescriptMRD(window_length=f, name=f"mrd{i}")(x))
        return out


class CombineDiscriminators(nn.Module):
    """Concatenate sub-discriminator outputs (reference
    ``discriminator.py:197-208``).  ``members`` picks from the registry;
    the v2 config combines MPD + MSD + MS-spectral
    (``configs/v2.gin:86-91``)."""
    members: Sequence[str] = ("periods", "scales", "spectral")
    capacity: int = 64
    spectral_scales: Sequence[int] = (4096, 2048, 1024, 512, 256)

    @nn.compact
    def __call__(self, x: jax.Array) -> list[list[jax.Array]]:
        out = []
        for m in self.members:
            if m == "periods":
                out.extend(MultiPeriodDiscriminator(name="mpd")(x))
            elif m == "scales":
                out.extend(MultiScaleDiscriminator(capacity=self.capacity,
                                                   name="msd")(x))
            elif m == "spectral":
                out.extend(MultiScaleSpectralDiscriminator(
                    scales=tuple(self.spectral_scales),
                    name="msspec")(x))
            elif m == "spectral_1d":
                out.extend(MultiScaleSpectralDiscriminator1d(
                    scales=tuple(self.spectral_scales),
                    capacity=self.capacity,
                    name="msspec1d")(x))
            elif m == "univnet":
                out.extend(UnivNetDiscriminator(name="univnet")(x))
            elif m == "melgan_stack":
                out.extend(StackDiscriminators(name="stack")(x))
            elif m == "descript":
                out.extend(DescriptDiscriminator(name="descript")(x))
            else:
                raise ValueError(f"unknown discriminator member {m!r}")
        return out


def member_sub_count(member: str, disc_cfg=None) -> int:
    """Number of sub-discriminators (feature lists) each member emits --
    used to apply per-member loss weights (reference weighs the MelGAN
    stack at 0.1, model.py:518-519).  Counts that depend on the
    discriminator config (scale/period lists) are derived from
    ``disc_cfg`` when given, so non-default configs can't silently
    mis-align ``member_weights``."""
    if disc_cfg is not None and member in ("spectral", "spectral_1d"):
        # the only combine members whose sub-count follows the config
        # (the "periods" member keeps the MPD's own default prime
        # periods)
        return len(disc_cfg.spectral_scales)
    return {
        "periods": 5,
        "scales": 3,
        "spectral": 5,
        "spectral_1d": 5,
        "univnet": 8,        # 3 MRD + 5 MPD
        "melgan_stack": 3,
        "descript": 8,       # 5 MPD + 3 MRD
    }[member]


DISCRIMINATORS = {
    "multi_scale": MultiScaleDiscriminator,
    "multi_period": MultiPeriodDiscriminator,
    "spectral": MultiScaleSpectralDiscriminator,
    "spectral_1d": MultiScaleSpectralDiscriminator1d,
    "univnet": UnivNetDiscriminator,
    "melgan_stack": StackDiscriminators,
    "descript": DescriptDiscriminator,
    "combine": CombineDiscriminators,
}
