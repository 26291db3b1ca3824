"""Time-axis (context) parallelism with receptive-field halos.

The reference scales sequence length only by streaming (SURVEY §5.7); it
has no attention, so the honest TPU "context parallelism" for this
fully-convolutional model is overlap-save over a ``time`` mesh axis:
each device holds a contiguous time shard, gathers a halo of
receptive-field size from its neighbours with ``ppermute`` over ICI,
runs the unmodified offline network locally, and crops the
halo-contaminated borders.  Missing neighbours (global clip edges)
contribute zeros, matching offline zero padding beyond the receptive
field.

Exact in the interior: any output sample further than the network's
receptive-field radius from a shard boundary sees precisely the same
input window as the unsharded computation, so with ``halo >= rf`` the
sharded forward (and its gradient -- ``shard_map``/``ppermute``
differentiate) matches offline up to float reassociation.

Use :func:`rave_tpu.utils.receptive_field.measure_receptive_field` (the
analogue of reference ``core.py:190-226``) to size the halo, then round
up with :func:`halo_for`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.4.35
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

TIME_AXIS = "time"
DATA_AXIS = "data"


def make_time_mesh(n_time: int, n_data: int = 1) -> Mesh:
    """2D (data, time) mesh; time neighbours are adjacent on the ring so
    halo ppermutes ride single ICI hops."""
    devs = np.asarray(jax.devices()[: n_data * n_time]).reshape(
        n_data, n_time)
    return Mesh(devs, (DATA_AXIS, TIME_AXIS))


def halo_for(receptive_field: int, hop: int) -> int:
    """Round the receptive field up to a whole number of model hops so
    shard boundaries stay stride-aligned through every layer."""
    return int(-(-receptive_field // hop) * hop)


def time_sharded(fn: Callable[[jax.Array], jax.Array], mesh: Mesh,
                 halo: int, hop: int,
                 data_sharded: bool = False) -> Callable:
    """Wrap a same-length map ``fn((B,T,C)) -> (B,T,C')`` so the time
    axis is computed across ``mesh``'s ``time`` axis.

    ``halo`` must be a multiple of ``hop`` (the total stride product,
    ``cfg.total_ratio()``), as must each device's local shard length.
    ``fn``'s output channel count may differ but its time length must
    equal its input's (true for RAVE forward; for encode-like ratios
    compose :func:`time_sharded_ratio` instead).
    """
    if halo % hop:
        raise ValueError(f"halo {halo} not a multiple of hop {hop}")
    n = mesh.shape[TIME_AXIS]
    in_spec = P(DATA_AXIS if data_sharded else None, TIME_AXIS, None)

    def local(x_l: jax.Array) -> jax.Array:
        T_l = x_l.shape[1]
        if T_l % hop:
            raise ValueError(f"local shard {T_l} not a multiple of {hop}")
        # right edge -> right neighbour's left halo, and vice versa;
        # devices with no source receive zeros (global signal edge)
        left = jax.lax.ppermute(x_l[:, -halo:], TIME_AXIS,
                                [(i, i + 1) for i in range(n - 1)])
        right = jax.lax.ppermute(x_l[:, :halo], TIME_AXIS,
                                 [(i, i - 1) for i in range(1, n)])
        xx = jnp.concatenate([left, x_l, right], axis=1)
        y = fn(xx)
        if y.shape[1] != xx.shape[1]:
            raise ValueError(
                f"fn changed time length {xx.shape[1]} -> {y.shape[1]}; "
                "time_sharded requires a same-length map")
        return y[:, halo: halo + T_l]

    return shard_map(local, mesh=mesh, in_specs=(in_spec,),
                     out_specs=in_spec)


def time_sharded_ratio(fn: Callable[[jax.Array], jax.Array], mesh: Mesh,
                       halo: int, hop: int, ratio: int,
                       data_sharded: bool = False) -> Callable:
    """Like :func:`time_sharded` for maps that change the time length by
    a fixed integer ``ratio`` (>1: downsample by ratio, e.g. encode;
    the output hop is ``hop // ratio`` frames)."""
    if halo % hop or hop % ratio:
        raise ValueError("halo/hop must be multiples of hop/ratio")
    n = mesh.shape[TIME_AXIS]
    in_spec = P(DATA_AXIS if data_sharded else None, TIME_AXIS, None)
    h_out = halo // ratio

    def local(x_l: jax.Array) -> jax.Array:
        T_l = x_l.shape[1]
        if T_l % hop:
            raise ValueError(f"local shard {T_l} not a multiple of {hop}")
        left = jax.lax.ppermute(x_l[:, -halo:], TIME_AXIS,
                                [(i, i + 1) for i in range(n - 1)])
        right = jax.lax.ppermute(x_l[:, :halo], TIME_AXIS,
                                 [(i, i - 1) for i in range(1, n)])
        xx = jnp.concatenate([left, x_l, right], axis=1)
        y = fn(xx)
        expect = xx.shape[1] // ratio
        if y.shape[1] != expect:
            raise ValueError(
                f"fn time length {y.shape[1]} != {expect} "
                f"(input {xx.shape[1]} / ratio {ratio})")
        return y[:, h_out: h_out + T_l // ratio]

    return shard_map(local, mesh=mesh, in_specs=(in_spec,),
                     out_specs=in_spec)
