"""LFPN — Low-level Feature Pyramid Network fusion (SURVEY.md §2 'LFPN
fusion' [B][K — PyramidBox]).

Top-down fusion starting from a MIDDLE layer (fc7, stride 32), not the top:
deep/high-stride features describe large faces and carry little signal for
the small-face taps, so the top-down path only refines the three shallow
taps (conv5_3, conv4_3, conv3_3).  Each block:

    topdown = up2(1x1_conv(higher))
    lateral = 1x1_conv(lower)
    fused   = topdown * lateral        # element-wise product [K]
                                       # (config.lfpn_fuse_op = 'sum' for FPN add)

Deep taps (fc7, conv6_2, conv7_2) pass through unchanged.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dan_tpu.config import ModelConfig
from dan_tpu.models.layers import conv2d, conv_init, upsample2x
from dan_tpu.models.vgg import TAP_NAMES, raw_tap_channels

# Top-down order: (higher_tap, lower_tap).  The fused channel width of each
# lower tap comes from ModelConfig.lfpn_channels (ordered conv3_3, conv4_3,
# conv5_3 — a [?] constant kept in config for one-line parity fixes).
_LFPN_PAIRS = (
    ("fc7", "conv5_3"),
    ("conv5_3", "conv4_3"),
    ("conv4_3", "conv3_3"),
)


def _pair_channels(config: ModelConfig):
    """(higher_tap, lower_tap, lower_channels) in top-down order."""
    by_tap = dict(
        zip(("conv3_3", "conv4_3", "conv5_3"), config.lfpn_channels)
    )
    return tuple((hi, lo, by_tap[lo]) for hi, lo in _LFPN_PAIRS)


def init_lfpn_params(key, config: ModelConfig) -> Dict:
    params: Dict = {}
    tap_ch = dict(zip(TAP_NAMES, raw_tap_channels(config)))
    pairs = _pair_channels(config)
    keys = jax.random.split(key, 2 * len(pairs))
    for i, (hi, lo, lo_ch) in enumerate(pairs):
        # The 'higher' input to block i is the fused output of block i-1,
        # which has the lower tap's channel count.
        hi_ch = tap_ch[hi] if i == 0 else pairs[i - 1][2]
        params[f"lfpn_td_{lo}"] = conv_init(keys[2 * i], 1, 1, hi_ch, lo_ch)
        params[f"lfpn_lat_{lo}"] = conv_init(keys[2 * i + 1], 1, 1, lo_ch, lo_ch)
    return params


def lfpn_forward(
    params: Dict, taps: Dict[str, jnp.ndarray], config: ModelConfig
) -> Dict[str, jnp.ndarray]:
    """Fuse the three shallow taps top-down; returns a new tap dict."""
    out = dict(taps)
    higher = taps["fc7"]
    for hi, lo, _ in _pair_channels(config):
        topdown = upsample2x(conv2d(params[f"lfpn_td_{lo}"], higher))
        lateral = conv2d(params[f"lfpn_lat_{lo}"], taps[lo])
        # Guard odd spatial dims: crop topdown to lateral's shape.
        topdown = topdown[:, : lateral.shape[1], : lateral.shape[2], :]
        if config.lfpn_fuse_op == "product":
            fused = topdown * lateral
        elif config.lfpn_fuse_op == "sum":
            fused = topdown + lateral
        else:
            raise ValueError(f"unknown lfpn_fuse_op {config.lfpn_fuse_op!r}")
        out[lo] = fused
        higher = fused
    return out
