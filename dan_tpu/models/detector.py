"""The full DAN detector model: VGG-16 -> LFPN -> L2Norm -> multibox heads.

Equivalent of the reference's `net/dan_net.py` forward graph [?] (SURVEY.md
§2 L4), as a pure function over a parameter pytree:

    params = init_detector_params(key, config)
    cls_logits, loc_preds = detector_forward(params, images, config)

Images are (B, H, W, 3) float32 RGB, already mean-subtracted
(dan_tpu.ops.preprocess handles that); compute runs in config.compute_dtype
(bf16 on TPU) with f32 params and f32 logits out.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dan_tpu.config import ModelConfig
from dan_tpu.models.heads import heads_forward, init_head_params
from dan_tpu.models.layers import l2_normalize, l2norm_init
from dan_tpu.models.lfpn import init_lfpn_params, lfpn_forward
from dan_tpu.models.vgg import (
    TAP_NAMES,
    effective_tap_channels,
    init_vgg_params,
    vgg_forward,
)


def init_detector_params(key, config: ModelConfig) -> Dict:
    k_vgg, k_lfpn, k_heads = jax.random.split(key, 3)
    params = {
        "backbone": init_vgg_params(k_vgg, config),
        "lfpn": init_lfpn_params(k_lfpn, config),
        "heads": init_head_params(k_heads, config),
        "l2norm": {},
    }
    tap_ch = dict(zip(TAP_NAMES, effective_tap_channels(config)))
    for name, init in zip(config.l2norm_taps, config.l2norm_init):
        params["l2norm"][name] = l2norm_init(tap_ch[name], init)
    return params


def detector_forward(
    params: Dict,
    images: jnp.ndarray,
    config: ModelConfig,
    for_inference: bool = False,
    data_island=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W, 3) f32 -> (cls_logits (B, A, 2) f32, loc_preds (B, A, 4) f32).

    A = sum over layers of H_l * W_l (one anchor per position), in the same
    order as dan_tpu.box.anchors.generate_anchors.

    for_inference: caller guarantees no gradients flow through this call —
    lets the backbone use inference-only fused kernels (see vgg_forward).
    data_island: optional (Mesh, axis) the batch dim is sharded over —
    forwarded to the backbone so its Pallas backward runs in a shard_map
    island on multi-chip meshes (see vgg_forward).
    """
    x = images.astype(jnp.dtype(config.compute_dtype))
    taps = vgg_forward(params["backbone"], x, config, for_inference, data_island)
    taps = lfpn_forward(params["lfpn"], taps, config)
    # L2-normalize shallow (post-LFPN) taps before the heads
    # [K — S3FD normalizes conv3_3/4_3/5_3; PyramidBox normalizes the fused
    #  maps.  Order isolated here; verify against reference].
    for name in config.l2norm_taps:
        taps[name] = l2_normalize(params["l2norm"][name], taps[name])
    return heads_forward(params["heads"], taps, config)


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
