"""Single-input-channel 1D conv (the MelGAN/MSD head) -- Pallas TPU
kernels for forward and the data gradient.

The MelGAN ladder's head conv (k=15, 1 -> 16 channels, stride 1;
reference ``rave/blocks.py:965-975``) gives the MXU nothing to contract
(ci=1), and XLA's conv runs ~25x off the HBM floor (measured 1.06 ms fwd
+ 3.1 ms dx at (16, 131072) vs a ~0.1 ms floor;
docs/speed_of_light.md "Remaining slack" #1).  A pure-JAX shift-and-add
formulation wins isolated but loses in-graph: the k explicit shifted
adds break XLA's surrounding fusions (round-4 ledger).  A Pallas kernel
owns its memory traffic, so the formulation win survives composition.

Layout strategy (the whole trick): put TIME on the 128-wide lane axis.

* forward: broadcast the 1-channel input across ``co`` sublanes, then
  the k taps are k lane-shifted FMAs over a ``(co, tile)`` accumulator
  -- full lane occupancy (a ``(tile, co)`` accumulator would use co=16
  of 128 lanes).  One in-VMEM transpose emits the ``(tile, co)`` block
  the surrounding NWC graph expects.
* dx: ``dx[t] = sum_o g[t+o-pr, :] . w[k-1-o, :]`` -- transpose the
  gradient tile to ``(co, tile)``, k lane-shifted FMAs with per-sublane
  weights, one sublane reduction to ``(1, tile)``.
* dw keeps XLA's native rule (already near floor -- it is a reduction
  over the big operands to a (k, 1, co) result).

Grid is ``(B, T/tile)``; tiles overlap by the kernel halo, so the input
window is DMA'd manually from HBM (BlockSpec index maps cannot express
overlap), following ``residual_unit.py``'s pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lane-aligned halo: covers any k <= 128 taps and keeps every DMA slice
# 128-aligned in the (lane-mapped) time axis
_HALO = 128
_TILE = 4096


def _fwd_kernel(xp_hbm, wT_ref, out_ref, *, k: int, tile: int, co: int):
    b = pl.program_id(0)
    i = pl.program_id(1)

    def body(xbuf, sem):
        cp = pltpu.make_async_copy(
            xp_hbm.at[pl.ds(b, 1), pl.ds(i * tile, tile + _HALO)],
            xbuf, sem)
        cp.start()
        cp.wait()
        # (1, tile+halo) -> broadcast across the co sublanes
        xb = jnp.broadcast_to(xbuf[:], (co, tile + _HALO)) \
            .astype(jnp.float32)
        acc = jnp.zeros((co, tile), jnp.float32)
        for kt in range(k):
            # lane-shifted slice x[t + kt], weighted per-sublane (channel)
            acc = acc + xb[:, kt:kt + tile] * wT_ref[:, kt:kt + 1] \
                .astype(jnp.float32)
        out_ref[0, 0] = jnp.transpose(acc).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((1, tile + _HALO), xp_hbm.dtype),
        pltpu.SemaphoreType.DMA,
    )


def _dx_kernel(gp_hbm, wrevT_ref, out_ref, *, k: int, tile: int, co: int):
    b = pl.program_id(0)
    i = pl.program_id(1)

    def body(gbuf, sem):
        cp = pltpu.make_async_copy(
            gp_hbm.at[b, pl.ds(i * tile, tile + _HALO), :], gbuf, sem)
        cp.start()
        cp.wait()
        # (tile+halo, co) -> (co, tile+halo): time on lanes
        gT = jnp.transpose(gbuf[:]).astype(jnp.float32)
        acc = jnp.zeros((co, tile), jnp.float32)
        for o in range(k):
            acc = acc + gT[:, o:o + tile] * wrevT_ref[:, o:o + 1] \
                .astype(jnp.float32)
        out_ref[0, 0] = jnp.sum(acc, axis=0, keepdims=True) \
            .astype(out_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((tile + _HALO, co), gp_hbm.dtype),
        pltpu.SemaphoreType.DMA,
    )


def _pallas_fwd(x, kernel, pad, tile: int = _TILE, interpret: bool = False):
    """x (B, T, 1), kernel (k, 1, co), pad (pl, pr) with pl+pr == k-1."""
    B, T, _ = x.shape
    k, _, co = kernel.shape
    pl_, _ = pad
    n_tiles = pl.cdiv(T, tile)
    xp = jnp.pad(x[..., 0], ((0, 0),
                             (pl_, n_tiles * tile + _HALO - T - pl_)))
    wT = jnp.transpose(kernel[:, 0, :])  # (co, k)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, tile=tile, co=co),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, tile, co), x.dtype),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((co, k), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile, co), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, wT)
    return out.reshape(B, n_tiles * tile, co)[:, :T]


def _pallas_dx(g, kernel, pad, T: int, tile: int = _TILE,
               interpret: bool = False):
    """g (B, T, co) -> dx (B, T, 1).  dx[t] = sum_o gp[t+o] @ w[k-1-o]
    with gp padded (pr, pl) -- the adjoint of the same-length conv."""
    B, Tg, co = g.shape
    k = kernel.shape[0]
    _, pr = pad
    n_tiles = pl.cdiv(T, tile)
    gp = jnp.pad(g, ((0, 0), (pr, n_tiles * tile + _HALO - Tg - pr),
                     (0, 0)))
    wrevT = jnp.transpose(kernel[::-1, 0, :])  # (co, k), tap k-1-o at col o
    out = pl.pallas_call(
        functools.partial(_dx_kernel, k=k, tile=tile, co=co),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, 1, tile), g.dtype),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((co, k), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, tile), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(gp, wrevT)
    return out.reshape(B, n_tiles * tile)[:, :T, None]


def _native_fwd(x, kernel, pad):
    return jax.lax.conv_general_dilated(
        x, kernel, (1,), [pad], dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype)


def _on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1d_ci1_pallas(x, kernel, pad):
    """Same-length ci=1 1D conv with Pallas fwd/dx on TPU (XLA elsewhere).

    x (B, T, 1), kernel (k, 1, co), pad (pl, pr) with pl+pr == k-1.
    """
    if not _on_tpu():
        return _native_fwd(x, kernel, pad)
    return _pallas_fwd(x, kernel, pad)


def _vjp_fwd(x, kernel, pad):
    return conv1d_ci1_pallas(x, kernel, pad), (x, kernel)


def _vjp_bwd(pad, res, g):
    x, kernel = res
    _, dw_fn = jax.vjp(lambda w: _native_fwd(x, w, pad), kernel)
    (dw,) = dw_fn(g)
    if _on_tpu():
        dx = _pallas_dx(g, kernel, pad, x.shape[1])
    else:
        _, dx_fn = jax.vjp(lambda xx: _native_fwd(xx, kernel, pad), x)
        (dx,) = dx_fn(g)
    return dx, dw


conv1d_ci1_pallas.defvjp(_vjp_fwd, _vjp_bwd)
