"""Anti-aliased (filtered) leaky ReLU with Kaiser up/down-sampling — the
StyleGAN3 op family used by CNO's 'lrelu' activation mode.

Functional spec: the reference's pure-PyTorch fallbacks
(`CNO_libs/local_torch_utils/ops/upfirdn2d.py:167-214` `_upfirdn2d_ref`,
`ops/filtered_lrelu.py:120-153` `_filtered_lrelu_ref`) and the filter design
in `CNO_libs/training/filtered_networks.py:319-422` (separable Kaiser FIR via
scipy.signal.firwin; factors/taps/padding from the sampling-rate geometry).
Pipeline per 2-D slice:

    bias → upsample (zero-stuff ×up, FIR, gain=up²) → leaky-ReLU, gain √2
         → downsample (FIR, stride ×down)

Note: the reference wires this op into CNO3d's 3-D blocks but its
implementation only accepts 4-D tensors, so the 'lrelu' mode crashes upstream
on this benchmark's 3-D data (only the shipped 'LeakyReLU' configs run).
`filtered_lrelu_3d` folds the T axis into the batch and applies the op per
frame — a working TPU-native generalization.

TPU notes: each separable FIR pass is ONE `lax.conv_general_dilated`
depthwise conv — `lhs_dilation` implements the zero-stuffing upsample without
materializing the up-buffer, `window_strides` fuses the downsample, and
negative pads express the crop. No Python-level resampling loops.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def design_lowpass_filter(numtaps: int, cutoff: float, width: float,
                          fs: float):
    """Separable Kaiser low-pass (filtered_networks.py:401-414); None = the
    identity filter (numtaps == 1)."""
    assert numtaps >= 1
    if numtaps == 1:
        return None
    import scipy.signal

    f = scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width, fs=fs)
    return np.asarray(f, np.float32)


def _depthwise_pass(x, f, axis, up, down, pad):
    """One separable FIR pass over axis 1 (H) or 2 (W) of [B, H, W, C]:
    zero-stuff ×up via lhs_dilation, pad (may be negative), correlate,
    stride ×down."""
    C = x.shape[-1]
    taps = f.shape[0]
    if axis == 1:
        kernel = jnp.broadcast_to(f.reshape(taps, 1, 1, 1), (taps, 1, 1, C))
        strides, dil, padding = (down, 1), (up, 1), (pad, (0, 0))
    else:
        kernel = jnp.broadcast_to(f.reshape(1, taps, 1, 1), (1, taps, 1, C))
        strides, dil, padding = (1, down), (1, up), ((0, 0), pad)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        lhs_dilation=dil, feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def upfirdn2d(x, f, up=1, down=1, padding=(0, 0, 0, 0), gain=1.0,
              flip_filter=False):
    """x: [B, H, W, C]; f: 1-D separable FIR (None = identity).
    padding = (px0, px1, py0, py1): x-pads on W, y-pads on H (reference
    `_parse_padding` order, upfirdn2d.py:178-183)."""
    px0, px1, py0, py1 = padding
    if f is None:
        f = np.ones(1, np.float32)
    f = np.asarray(f, np.float32) * (float(gain) ** 0.5)
    if not flip_filter:
        # the torch ref flips then runs torch's correlation == convolution;
        # our conv is also correlation, so flip identically
        f = f[::-1].copy()
    fj = jnp.asarray(f)

    # zero-stuffing in the ref appends up-1 trailing zeros per sample
    # (length in·up); lhs_dilation gives in·up-(up-1) — fold the difference
    # into the trailing pad
    y = _depthwise_pass(x, fj, axis=1, up=up, down=down,
                        pad=(py0, py1 + up - 1))
    z = _depthwise_pass(y, fj, axis=2, up=up, down=down,
                        pad=(px0, px1 + up - 1))
    return z


def filtered_lrelu_2d(x, fu, fd, bias, up, down, padding, gain=np.sqrt(2),
                      slope=0.2):
    """Reference `_filtered_lrelu_ref` (filtered_lrelu.py:120-153),
    channels-last. padding = (px0, px1, py0, py1)."""
    if bias is not None:
        x = x + bias
    x = upfirdn2d(x, fu, up=up, padding=padding, gain=up**2)
    x = jnp.where(x >= 0, x, x * slope) * gain
    x = upfirdn2d(x, fd, down=down)
    return x


@lru_cache(maxsize=128)
def lrelu_geometry(in_size: int, out_size: int, in_cutoff: float,
                   out_cutoff: float, in_half_width: float,
                   out_half_width: float, filter_size: int = 6,
                   lrelu_upsampling: int = 2):
    """Factors, filters, and padding of the LReLu layer
    (filtered_networks.py:349-383); sampling rates equal the sizes in CNO."""
    in_rate, out_rate = in_size, out_size
    tmp_rate = max(in_rate, out_rate) * lrelu_upsampling

    up = int(np.rint(tmp_rate / in_rate))
    up_taps = filter_size * up if up > 1 else 1
    fu = design_lowpass_filter(up_taps, in_cutoff, in_half_width * 2, tmp_rate)

    down = int(np.rint(tmp_rate / out_rate))
    down_taps = filter_size * down if down > 1 else 1
    fd = design_lowpass_filter(down_taps, out_cutoff, out_half_width * 2,
                               tmp_rate)

    pad_total = (out_size - 1) * down + 1
    pad_total -= in_size * up
    pad_total += up_taps + down_taps - 2
    pad_lo = (pad_total + up) // 2
    pad_hi = pad_total - pad_lo
    padding = (int(pad_lo), int(pad_hi), int(pad_lo), int(pad_hi))
    return up, down, fu, fd, padding


def filtered_lrelu_3d(x, *, in_size, out_size, in_cutoff, out_cutoff,
                      in_half_width, out_half_width, filter_size=6,
                      lrelu_upsampling=2, bias=None):
    """x: [B, T, H, W, C] → [B, T, H', W', C] — the 2-D filtered lrelu applied
    per frame with the LReLu geometry (spatial axes resampled, T untouched)."""
    up, down, fu, fd, padding = lrelu_geometry(
        int(in_size), int(out_size), float(in_cutoff), float(out_cutoff),
        float(in_half_width), float(out_half_width), int(filter_size),
        int(lrelu_upsampling),
    )
    B, T, H, W, C = x.shape
    flat = x.reshape(B * T, H, W, C)
    out = filtered_lrelu_2d(flat, fu, fd, bias, up, down, padding)
    return out.reshape(B, T, out.shape[1], out.shape[2], C)
