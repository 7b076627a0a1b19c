"""The jit-compiled SPMD training step and outer loop.

TPU mapping of the reference's estimator train flow (SURVEY.md §3.1): one
compiled `train_step(state, batch) -> (state, metrics)` containing the FULL
per-step pipeline on device —

    uint8 canvas -> fused preprocess (crop/resize/distort/flip/normalize)
    -> anchor matching/encoding -> forward (VGG+LFPN+heads)
    -> loss (CE + HNM + smooth-L1) -> grads -> SGD update

sharded over a ('data',) mesh: batch split across chips, params replicated,
gradient all-reduce inserted by XLA over ICI.  No per-step Python graph
work, no host math (host only supplies padded uint8 canvases + scalar crop
params + gt boxes).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from dan_tpu.box.anchors import generate_anchors
from dan_tpu.box.matching import match_anchors_batch
from dan_tpu.config import DANConfig
from dan_tpu.models.detector import detector_forward, init_detector_params
from dan_tpu.ops.preprocess import CropParams, train_preprocess_one
from dan_tpu.parallel.mesh import batch_sharding, replicated
from dan_tpu.train.loss import detection_loss
from dan_tpu.train.optim import make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # () int32


def create_train_state(config: DANConfig, key: jax.Array) -> TrainState:
    params = init_detector_params(key, config.model)
    tx = make_optimizer(config.train)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def preprocess_and_match(
    batch: Dict[str, jnp.ndarray], config: DANConfig, mesh=None
):
    """Device-side input stage: fused preprocess + anchor match/encode.

    When a multi-device mesh is given, the matcher runs inside an explicit
    shard_map island over the data axis: match_anchors_batch iterates the
    batch with a per-image lax.map (a real lax.cond picks the half-width
    G=128 kernel variant per image), and GSPMD cannot partition a scan
    over a sharded leading dim — without the island it would all-gather
    the gt tensors and run the full GLOBAL batch's kernels serially on
    every chip.  shard_map hands each chip only its local shard, which is
    also the only validated way to run Pallas custom calls under SPMD
    (GSPMD has no partitioning rule for them).
    """
    size = config.preprocess.train_image_size
    anchors = generate_anchors(config.anchors, size, size)

    def per_image(canvas, x0, y0, csize, boxes, mask, seed):
        key = jax.random.PRNGKey(seed)
        crop = CropParams(x0, y0, csize)
        return train_preprocess_one(
            canvas, crop, boxes, mask, key, config.preprocess
        )

    images, boxes, mask = jax.vmap(per_image)(
        batch["canvas"],
        batch["crop_x0"],
        batch["crop_y0"],
        batch["crop_size"],
        batch["boxes"],
        batch["mask"],
        batch["seed"],
    )
    def match_local(b, m):
        return match_anchors_batch(anchors, b, m, config.match, config.anchors)

    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P

        axis = config.mesh.data_axis
        # check_vma=False: Pallas custom calls carry no varying-mesh-axes
        # info, and default VMA checking rejects them at trace time (same
        # reason as the TTA island in eval/tta.py).
        targets = jax.shard_map(
            match_local,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )(boxes, mask)
    else:
        targets = match_local(boxes, mask)
    return images, targets


def make_train_step(config: DANConfig, mesh=None):
    """Build the pure (state, batch) -> (state, metrics) step function."""
    tx = make_optimizer(config.train)
    model_cfg = config.model
    # The Pallas phase-pool backward is a custom call GSPMD cannot
    # partition — on multi-device meshes the backbone runs it inside a
    # shard_map island over the data axis instead (same pattern as the
    # matcher island in preprocess_and_match).
    island = (
        (mesh, config.mesh.data_axis)
        if mesh is not None and mesh.devices.size > 1
        else None
    )

    def loss_fn(params, images, targets):
        cls_logits, loc_preds = detector_forward(
            params, images, model_cfg, data_island=island
        )
        return detection_loss(
            cls_logits,
            loc_preds,
            targets.cls_target,
            targets.loc_target,
            config.train,
        )

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        images, targets = preprocess_and_match(batch, config, mesh)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, targets
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return train_step


def make_sharded_train_step(config: DANConfig, mesh):
    """jit the step with DP shardings: batch on ('data',), state replicated.

    XLA turns the replicated-param constraint into a gradient all-reduce
    over ICI — the TPU-native equivalent of the reference's (absent)
    multi-GPU tower sum (SURVEY.md §2).
    """
    step_fn = make_train_step(config, mesh)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, config.mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bsh),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
