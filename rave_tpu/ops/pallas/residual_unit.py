"""Fused dilated residual unit -- Pallas TPU kernel.

The dominant op in EncoderV2/GeneratorV2 is the dilated unit
(reference ``rave/blocks.py:84-113``):

    y = x + W2 @ lrelu( W1 *_dilated lrelu(x) + b1 ) + b2

XLA runs this as 4+ HBM round trips (act, conv, act, conv, add).  This
kernel keeps the whole chain in VMEM per time-tile: the dilated k-tap
conv becomes k shifted ``(TILE, C) @ (C, C)`` matmuls on the MXU, the
activations and the residual add stay on-chip.  Weights (k*C*C + C*C)
fit VMEM for C <= 512 (v2 uses C in 64..1024; the C=1024 level tiles
the channel dim).

Forward-only Pallas with a ``jax.custom_vjp`` whose backward is plain
XLA (training uses the XLA path's gradients; serving -- the RTF-critical
path -- gets the fused forward).

Measured on v5e (2026-08, 4096-sample streaming decode chunks,
bf16): XLA's own fusion beats this kernel (RTF 0.0094 vs 0.0133) --
per-block time dims are tiny (<=256 band frames), so the manual halo
DMA + small grid overheads dominate.  ``fused_kernels`` therefore stays
**off by default**; the kernel remains for large-T offline workloads
where the tile loop amortises.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_SLOPE = 0.2


def _lrelu(x):
    return jnp.where(x >= 0, x, NEG_SLOPE * x)


def _reference_impl(x, w1, b1, w2, b2, dilation: int, pad_left: int,
                    pad_right: int):
    """XLA reference (also the VJP path). x: (B, T, C)."""
    h = _lrelu(x)
    h = jnp.pad(h, ((0, 0), (pad_left, pad_right), (0, 0)))
    y = jax.lax.conv_general_dilated(
        h, w1, window_strides=(1,), padding=[(0, 0)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32).astype(x.dtype) + b1
    y = _lrelu(y)
    y = jnp.einsum("btc,cd->btd", y, w2,
                   preferred_element_type=jnp.float32).astype(x.dtype) + b2
    return x + y


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *,
            k: int, dilation: int, tile: int, res_off: int):
    # x_hbm: (B, Tp, C) in HBM -- tiles overlap by the halo, so the slice
    # is DMA'd manually (BlockSpec index maps cannot express overlap).
    # The DMA'd window is tile + halo rounded up to 32 rows (a whole
    # number of sublane tiles for f32/bf16/i8): Mosaic rejects unaligned
    # dynamic memref slices.
    b = pl.program_id(0)
    i = pl.program_id(1)
    halo = _round_up((k - 1) * dilation, 32)
    C = out_ref.shape[-1]

    def body(xbuf, sem):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * tile, tile + halo), :],
            xbuf, sem)
        cp.start()
        cp.wait()
        h = _lrelu(xbuf[:])
        acc = jnp.zeros((tile, w1_ref.shape[2]), jnp.float32)
        for j in range(k):
            off = j * dilation
            acc += jnp.dot(h[off:off + tile], w1_ref[j],
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        y = acc + b1_ref[0].astype(jnp.float32)
        y = _lrelu(y)
        y = jnp.dot(y.astype(h.dtype), w2_ref[0],
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        y = y + b2_ref[0].astype(jnp.float32)
        # residual tap: un-padded x[t] sits at offset res_off (== pad_left)
        # inside the halo window
        out_ref[0, 0] = (xbuf[res_off:res_off + tile].astype(jnp.float32)
                         + y).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((tile + halo, C), x_hbm.dtype),
        pltpu.SemaphoreType.DMA,
    )
    # (halo >= (k-1)*dilation + res_off always holds: res_off = pad_left
    # <= (k-1)*dilation and both terms fit the rounded window)


def _pallas_forward(x, w1, b1, w2, b2, dilation: int, pad_left: int,
                    pad_right: int, tile: int = 256):
    B, T, C = x.shape
    k = w1.shape[0]
    halo = _round_up((k - 1) * dilation, 32)  # sublane-aligned DMA window (32 covers f32/bf16/i8 tiling)
    # pre-pad left/right; output tile i covers output frames
    # [i*tile, (i+1)*tile) and reads padded input [i*tile, i*tile+tile+halo)
    n_tiles = pl.cdiv(T, tile)
    total_in = n_tiles * tile + halo
    xp = jnp.pad(x, ((0, 0),
                     (pad_left, total_in - T - pad_left),
                     (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, dilation=dilation, tile=tile,
                          res_off=pad_left),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, tile, C), x.dtype),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((k, C, C), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(xp, w1, b1.reshape(1, C), w2[None] if w2.ndim == 2 else w2,
      b2.reshape(1, C))
    return out.reshape(B, n_tiles * tile, C)[:, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_dilated_unit(x, w1, b1, w2, b2, dilation: int, pad_left: int,
                       pad_right: int):
    """Fused lrelu->dilated conv->lrelu->1x1 conv->residual.

    x: (B, T, C); w1: (k, C, C); w2: (C, C).  Same-length output with
    (pad_left, pad_right) zero padding, matching the offline conv engine.
    Falls back to XLA off-TPU.
    """
    if jax.devices()[0].platform not in ("tpu", "axon"):
        return _reference_impl(x, w1, b1, w2, b2, dilation, pad_left,
                               pad_right)
    return _pallas_forward(x, w1, b1, w2, b2, dilation, pad_left, pad_right)


def _fwd(x, w1, b1, w2, b2, dilation, pad_left, pad_right):
    out = fused_dilated_unit(x, w1, b1, w2, b2, dilation, pad_left,
                             pad_right)
    return out, (x, w1, b1, w2, b2)


def _bwd(dilation, pad_left, pad_right, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _reference_impl(*a, dilation, pad_left, pad_right),
        x, w1, b1, w2, b2)
    return vjp(g)


fused_dilated_unit.defvjp(_fwd, _bwd)
