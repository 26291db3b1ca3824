"""Autograd receptive-field probe.

Reimplements the reference's measurement (``rave/core.py:190-226``): take
the gradient of one centre output sample w.r.t. the input and measure the
support.  Used as an offline calibration to validate the analytic RF
bound used by ``valid_signal_crop`` (``rave_tpu.train.loop.
receptive_field_frames``) and to report compression ratio / latency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def measure_receptive_field(apply_fn, T: int = 2 ** 15,
                            batch: int = 1) -> tuple[int, int]:
    """apply_fn: (B, T, 1) -> (B, T', C) deterministic encode+decode.

    Returns (left_rf, right_rf) in input samples.  Doubles T until the
    gradient support fits, like the reference.
    """
    while True:
        x = jnp.zeros((batch, T, 1), jnp.float32)

        def probe(inp):
            y = apply_fn(inp)
            return y[0, y.shape[1] // 2, 0]

        g = np.asarray(jax.grad(probe)(x))[0, :, 0]
        nz = np.flatnonzero(g != 0)
        if len(nz) == 0:
            raise RuntimeError("no gradient support -- wrong apply_fn?")
        if nz[0] > 0 and nz[-1] < T - 1:
            break
        T *= 2
    # centre sample in input coordinates
    y_len = None
    centre = T // 2
    left = int(centre - nz[0])
    right = int(nz[-1] - centre)
    return left, right
