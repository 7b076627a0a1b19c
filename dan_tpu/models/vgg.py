"""VGG-16 backbone with SSD extensions — the feature extractor of the
reference detector (SURVEY.md §2 'VGG-16 backbone' [B][K]).

Topology [K — S3FD/PyramidBox]:
  conv1_1..conv5_3 (13 3x3 convs, ReLU, 2x2/2 max-pools between blocks),
  pool5 (2x2/2) -> fc6 as 3x3 dilated conv -> fc7 as 1x1 conv,
  conv6_1 (1x1) -> conv6_2 (3x3/2), conv7_1 (1x1) -> conv7_2 (3x3/2).

Detection taps and strides:
  conv3_3 (4), conv4_3 (8), conv5_3 (16), fc7 (32), conv6_2 (64),
  conv7_2 (128).

Param names deliberately mirror TF-slim's vgg_16 scope structure
('conv1_1', ..., 'fc6', 'fc7', 'conv6_1', ...) so the TF-ckpt importer
(dan_tpu/ckpt/tf_import.py) is a name map, not a graph match.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from dan_tpu.config import ModelConfig
from dan_tpu.models.layers import conv2d, conv_init, max_pool

# (name, out_channels) per VGG conv block; pools follow each block.
VGG_BLOCKS: Tuple[Tuple[Tuple[str, int], ...], ...] = (
    (("conv1_1", 64), ("conv1_2", 64)),
    (("conv2_1", 128), ("conv2_2", 128)),
    (("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256)),
    (("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512)),
    (("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512)),
)

TAP_NAMES = ("conv3_3", "conv4_3", "conv5_3", "fc7", "conv6_2", "conv7_2")
TAP_CHANNELS = (256, 512, 512, 1024, 512, 256)


def effective_tap_channels(config: "ModelConfig"):
    """Tap widths as seen by the heads/L2Norm: the three shallow taps carry
    the LFPN-fused width (config.lfpn_channels, ordered conv3_3, conv4_3,
    conv5_3); deep taps pass through unchanged."""
    ch = dict(zip(TAP_NAMES, TAP_CHANNELS))
    for name, c in zip(("conv3_3", "conv4_3", "conv5_3"), config.lfpn_channels):
        ch[name] = c
    return tuple(ch[n] for n in TAP_NAMES)


def init_vgg_params(key, config: ModelConfig) -> Dict:
    """Initialize the full backbone parameter tree."""
    params: Dict = {}
    cin = 3
    n_convs = sum(len(b) for b in VGG_BLOCKS) + 6
    keys = list(jax.random.split(key, n_convs))
    ki = 0
    for block in VGG_BLOCKS:
        for name, cout in block:
            params[name] = conv_init(keys[ki], 3, 3, cin, cout)
            ki += 1
            cin = cout
    # fc6: 3x3 dilated [K — SSD subsamples the VGG fc weights; only relevant
    # when importing the classifier ckpt], fc7: 1x1.
    params["fc6"] = conv_init(keys[ki], 3, 3, 512, config.fc6_channels); ki += 1
    params["fc7"] = conv_init(keys[ki], 1, 1, config.fc6_channels, config.fc7_channels); ki += 1
    # Extra SSD layers.
    cin = config.fc7_channels
    for i, (mid, out) in enumerate(config.extra_channels, start=6):
        params[f"conv{i}_1"] = conv_init(keys[ki], 1, 1, cin, mid); ki += 1
        params[f"conv{i}_2"] = conv_init(keys[ki], 3, 3, mid, out); ki += 1
        cin = out
    return params


def vgg_forward(params: Dict, x: jnp.ndarray, config: ModelConfig) -> Dict[str, jnp.ndarray]:
    """Run the backbone; returns the six detection taps by name.

    x: (B, H, W, 3) in compute dtype (mean-subtracted pixels).
    """
    taps: Dict[str, jnp.ndarray] = {}
    for bi, block in enumerate(VGG_BLOCKS):
        for name, _ in block:
            x = conv2d(params[name], x)
            if name in TAP_NAMES:
                taps[name] = x
        x = max_pool(x)  # pools 1..5, each 2x2 stride 2 [K — S3FD keeps pool5 /2]
    x = conv2d(params["fc6"], x, dilation=config.fc6_dilation)
    x = conv2d(params["fc7"], x)
    taps["fc7"] = x
    for i in range(6, 6 + len(config.extra_channels)):
        x = conv2d(params[f"conv{i}_1"], x)
        x = conv2d(params[f"conv{i}_2"], x, stride=2)
        taps[f"conv{i}_2"] = x
    return taps
