"""SSD multibox heads — per-layer 3x3 convs producing class logits and box
offsets (SURVEY.md §2 'Multibox heads' [B][K]).

One square anchor per position (aspect ratio 1 only [K — S3FD]), so each
head layer emits (B, H, W, C_cls) and (B, H, W, 4), flattened row-major to
match dan_tpu.box.anchors' (H, W) anchor ordering.

Max-in-out [K — PyramidBox]: the stride-4 head predicts
`maxout_bg_size` background channels + 1 face channel; the background
logit is the max over its channels.  This suppresses small-face false
positives from the dense stride-4 anchor grid.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from dan_tpu.config import ModelConfig
from dan_tpu.models.layers import conv2d, conv_init
from dan_tpu.models.vgg import TAP_NAMES, effective_tap_channels


def _cls_channels(config: ModelConfig, layer_idx: int) -> int:
    if layer_idx == 0 and config.maxout_bg_size > 1:
        return config.maxout_bg_size + (config.num_classes - 1)
    return config.num_classes


def init_head_params(key, config: ModelConfig) -> Dict:
    params: Dict = {}
    keys = jax.random.split(key, 2 * len(TAP_NAMES))
    for i, (name, cin) in enumerate(
        zip(TAP_NAMES, effective_tap_channels(config))
    ):
        params[f"cls_{name}"] = conv_init(
            keys[2 * i], 3, 3, cin, _cls_channels(config, i)
        )
        params[f"loc_{name}"] = conv_init(keys[2 * i + 1], 3, 3, cin, 4)
    return params


def heads_forward(
    params: Dict, taps: Dict[str, jnp.ndarray], config: ModelConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (cls_logits (B, A, num_classes) f32, loc_preds (B, A, 4) f32)
    concatenated over the six layers in anchor order."""
    cls_out: List[jnp.ndarray] = []
    loc_out: List[jnp.ndarray] = []
    for i, name in enumerate(TAP_NAMES):
        x = taps[name]
        b = x.shape[0]
        # One conv per layer: cls and loc kernels concatenated along cout at
        # trace time.  Output channels are independent, so results are
        # bit-identical to two convs — but head outputs have <=8 channels
        # vs 128 TPU vector lanes, so halving the number of lane-padded
        # conv writes halves the head stage's HBM cost (BASELINE.md r2
        # profile: the stride-4 head writes alone were ~1.3 ms).
        n_cls = params[f"cls_{name}"]["kernel"].shape[-1]
        fused = {
            "kernel": jnp.concatenate(
                [params[f"cls_{name}"]["kernel"], params[f"loc_{name}"]["kernel"]],
                axis=-1,
            ),
            "bias": jnp.concatenate(
                [params[f"cls_{name}"]["bias"], params[f"loc_{name}"]["bias"]]
            ),
        }
        out = conv2d(fused, x, activation=False)
        cls = out[..., :n_cls].astype(jnp.float32)
        loc = out[..., n_cls:].astype(jnp.float32)
        if i == 0 and config.maxout_bg_size > 1:
            bg = jnp.max(cls[..., : config.maxout_bg_size], axis=-1, keepdims=True)
            cls = jnp.concatenate([bg, cls[..., config.maxout_bg_size :]], axis=-1)
        cls_out.append(cls.reshape(b, -1, config.num_classes))
        loc_out.append(loc.reshape(b, -1, 4))
    return jnp.concatenate(cls_out, axis=1), jnp.concatenate(loc_out, axis=1)
