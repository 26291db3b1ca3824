"""Static padding / delay algebra for the streaming conv engine.

The reference framework (abargum/RAVE) threads a ``cumulative_delay``
attribute through every module and relies on an external package
(``cached_conv``, see reference ``rave/blocks.py:34-47``) to convert
"centered" convolutions into causal+cached ones at export time.  Here the
algebra is computed *statically at model-build time* as plain Python ints,
so the streaming graph compiles to a fixed XLA program with no dynamic
shapes.

Conventions
-----------
* All delays are in frames at the *output rate* of the layer under
  discussion unless noted otherwise.
* ``get_padding(k, s, d, mode)`` mirrors the reference semantics
  (reference ``rave/blocks.py:70`` usage of ``cc.get_padding``):
  effective kernel ``ke = (k - 1) * d + 1``, total pad ``p = ke - s``;
  centered -> ``((p + 1) // 2, p // 2)``, causal -> ``(p, 0)``.
* A centered conv realised causally (streaming) lags the offline output.
  For a conv with right pad ``r``, stride ``s`` and accumulated input
  delay ``D_in`` (input-rate frames), we insert ``e`` extra frames of
  delay such that ``s | (D_in + r + e)`` and the output delay becomes
  ``(D_in + r + e) // s``.  This is the explicit, associativity-checked
  version of the bookkeeping scattered through the reference
  (``rave/blocks.py:73,110,135,193``).
"""

from __future__ import annotations

import dataclasses

PAD_MODES = ("centered", "causal")


def effective_kernel(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size - 1) * dilation + 1


def get_padding(kernel_size: int,
                stride: int = 1,
                dilation: int = 1,
                mode: str = "centered") -> tuple[int, int]:
    """(left, right) padding, matching the reference conventions."""
    if mode not in PAD_MODES:
        raise ValueError(f"Unknown padding mode {mode!r}")
    if kernel_size == 1:
        return (0, 0)
    p = effective_kernel(kernel_size, dilation) - stride
    if p < 0:
        raise ValueError(
            f"kernel {kernel_size} x dilation {dilation} smaller than stride {stride}")
    if mode == "causal":
        return (p, 0)
    return ((p + 1) // 2, p // 2)


@dataclasses.dataclass(frozen=True)
class ConvPlan:
    """Static streaming plan for one strided/dilated conv.

    Attributes
    ----------
    pad_left / pad_right: offline asymmetric padding.
    cache_len: input frames of carried left-context in streaming mode.
    extra: alignment delay (input frames) folded into the cache so the
        output delay is integral in output frames.
    out_delay: streaming output delay in output-rate frames, relative to
        the ideal (centered, zero-delay) offline pipeline.
    """
    kernel_size: int
    stride: int
    dilation: int
    mode: str
    pad_left: int
    pad_right: int
    extra: int
    cache_len: int
    out_delay: int


def plan_conv(kernel_size: int,
              stride: int = 1,
              dilation: int = 1,
              mode: str = "centered",
              in_delay: int = 0) -> ConvPlan:
    """Build the static streaming plan for a conv layer.

    ``in_delay`` is the accumulated delay of the incoming stream in
    *input-rate* frames.
    """
    left, right = get_padding(kernel_size, stride, dilation, mode)
    total_shift = in_delay + right
    extra = (-total_shift) % stride
    out_delay = (total_shift + extra) // stride
    cache_len = left + right + extra
    return ConvPlan(
        kernel_size=kernel_size,
        stride=stride,
        dilation=dilation,
        mode=mode,
        pad_left=left,
        pad_right=right,
        extra=extra,
        cache_len=cache_len,
        out_delay=out_delay,
    )


@dataclasses.dataclass(frozen=True)
class ConvTransposePlan:
    """Static streaming plan for a strided transposed conv (upsampler).

    Offline semantics follow the reference generator upsampler
    (``rave/blocks.py:182-186``): ``ConvTranspose1d(k=2*ratio,
    stride=ratio, padding=ratio//2)`` -- i.e. the full transposed-conv
    output is cropped by ``crop`` frames on each side.  Streaming keeps an
    overlap-add tail of ``kernel_size - stride`` output frames and emits
    blocks delayed by ``crop`` output frames.
    """
    kernel_size: int
    stride: int
    crop: int
    tail_len: int
    out_delay: int


def plan_conv_transpose(kernel_size: int,
                        stride: int,
                        crop: int,
                        in_delay: int = 0) -> ConvTransposePlan:
    if kernel_size < stride:
        raise ValueError("transposed conv kernel must be >= stride")
    tail_len = kernel_size - stride
    out_delay = in_delay * stride + crop
    return ConvTransposePlan(
        kernel_size=kernel_size,
        stride=stride,
        crop=crop,
        tail_len=tail_len,
        out_delay=out_delay,
    )


def align_delays(delays: list[int]) -> tuple[int, list[int]]:
    """Given per-branch delays, return (max_delay, per-branch extra delay).

    Mirrors ``cc.AlignBranches`` (reference ``rave/blocks.py:37-41``): each
    branch is padded with a pure delay line so all outputs line up at the
    slowest branch.
    """
    m = max(delays) if delays else 0
    return m, [m - d for d in delays]
