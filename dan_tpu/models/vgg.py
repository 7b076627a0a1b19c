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

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from dan_tpu.config import ModelConfig
from dan_tpu.models.layers import conv2d, conv_init, max_pool
from dan_tpu.utils.platform import on_tpu as _on_tpu

# (name, out_channels) per VGG conv block; pools follow each block.
VGG_BLOCKS: Tuple[Tuple[Tuple[str, int], ...], ...] = (
    (("conv1_1", 64), ("conv1_2", 64)),
    (("conv2_1", 128), ("conv2_2", 128)),
    (("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256)),
    (("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512)),
    (("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512)),
)

TAP_NAMES = ("conv3_3", "conv4_3", "conv5_3", "fc7", "conv6_2", "conv7_2")
# Default tap widths (ModelConfig defaults); kept as a reference constant —
# internal code derives widths from the config via raw_tap_channels so the
# ModelConfig channel fields stay one-line changes.
TAP_CHANNELS = (256, 512, 512, 1024, 512, 256)


def raw_tap_channels(config: "ModelConfig"):
    """Backbone tap widths straight from the config: the VGG conv taps are
    architecturally fixed (conv3_3/4_3/5_3 = 256/512/512), fc7 and the
    extra-block outputs are ModelConfig fields."""
    extras = tuple(out for _, out in config.extra_channels)
    ch = (256, 512, 512, config.fc7_channels) + extras
    assert len(ch) == len(TAP_NAMES), (
        "the 6-scale head contract needs exactly 2 extra blocks; got "
        f"{len(config.extra_channels)}"
    )
    return ch


def effective_tap_channels(config: "ModelConfig"):
    """Tap widths as seen by the heads/L2Norm: the three shallow taps carry
    the LFPN-fused width (config.lfpn_channels, ordered conv3_3, conv4_3,
    conv5_3); deep taps pass through unchanged."""
    ch = dict(zip(TAP_NAMES, raw_tap_channels(config)))
    for name, c in zip(("conv3_3", "conv4_3", "conv5_3"), config.lfpn_channels):
        ch[name] = c
    return tuple(ch[n] for n in TAP_NAMES)


def init_vgg_params(key, config: ModelConfig) -> Dict:
    """Initialize the full backbone parameter tree."""
    params: Dict = {}
    cin = 3
    n_convs = sum(len(b) for b in VGG_BLOCKS) + 2 + 2 * len(config.extra_channels)
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


def _phase_pool_pallas_active() -> bool:
    """Can the phase-pool backward kernel actually run here?  True on the
    real TPU, or anywhere when the module-level INTERPRET switch is set
    (tests / DAN_DRYRUN_PALLAS=interpret run it emulated on CPU)."""
    if _on_tpu():
        return True
    from dan_tpu.ops import phase_pool_pallas as ppp

    return ppp.INTERPRET


def _conv12_wgrad_active() -> bool:
    """Same gate for the conv1_2' weight-grad kernel
    (ops/conv12_wgrad_pallas.py)."""
    if _on_tpu():
        return True
    from dan_tpu.ops import conv12_wgrad_pallas as cwp

    return cwp.INTERPRET


def vgg_forward(
    params: Dict,
    x: jnp.ndarray,
    config: ModelConfig,
    for_inference: bool = False,
    data_island=None,
) -> Dict[str, jnp.ndarray]:
    """Run the backbone; returns the six detection taps by name.

    x: (B, H, W, 3) in compute dtype (mean-subtracted pixels).
    for_inference: the caller guarantees no gradients flow (detect/eval
    graphs) — enables the fused Pallas conv1 kernel (no VJP) on TPU.
    data_island: optional (Mesh, axis_name) under which the batch dim is
    sharded — routes the phase-pool backward's Pallas custom call through
    a shard_map island so multi-chip training keeps the kernel.

    DRIFT TRIPWIRE: dan_tpu/quant.py::collect_act_absmax mirrors this
    inference path by hand (calibration taps must match bit-for-bit —
    pinned by tests/unit/test_quant.py::test_stats_forward_tap_parity).
    Any change to the conv order, padding, packing, or tap points here
    must be made there too.
    """
    # NOTE: round 2 also built two fused conv1 Pallas kernels (conv1_2+pool;
    # + in-kernel conv1_1); both were exact-parity on TPU but net LOSSES
    # in-graph (conv-output relayout tax / unbuildable 3-channel im2col) and
    # were pruned in round 3 — full autopsy in BASELINE.md 'Fused conv1',
    # kernels recoverable from git history if Mosaic grows layout awareness.
    taps: Dict[str, jnp.ndarray] = {}
    for bi, block in enumerate(VGG_BLOCKS):
        if bi == 0 and config.conv1_packed and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # Pallas phase-pool backward: direct on single-device TPU
            # graphs; on multi-device meshes the train-step builder passes
            # data_island=(mesh, axis) and the backward runs inside a
            # shard_map island over the batch axis (GSPMD has no
            # partitioning rule for the custom call — same pattern as the
            # matcher island in train/loop.py).  Inference graphs never
            # run the backward, so the mode is inert there either way.
            mode: object = False
            if config.phase_pool_pallas_bwd and _phase_pool_pallas_active():
                mode = data_island if data_island is not None else True
            # conv1_2' weight-grad kernel: same dispatch shape.  None =
            # plain conv (inference graphs keep their exact jaxpr/HLO and
            # stay persistent-cache-warm); False = custom VJP with the XLA
            # twin backward; True/(mesh, axis) = Pallas kernel (islanded
            # with a psum when the batch axis is sharded).  The kernel
            # needs per-shard batch % 8 == 0 (sublane blocks).
            wgrad_mode: object = None
            if not for_inference:
                wgrad_mode = False
                if config.conv12_wgrad_pallas and _conv12_wgrad_active():
                    if data_island is not None:
                        mesh, _ = data_island
                        if (x.shape[0] // mesh.devices.size) % 8 == 0:
                            wgrad_mode = data_island
                    elif x.shape[0] % 8 == 0:
                        wgrad_mode = True
            x = conv1_block_packed(params, x, mode, wgrad_mode)
            continue
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


# ---------------------------------------------------------------------------
# Phase-packed (space-to-depth) conv1 block — TPU MXU/HBM-layout optimization
# ---------------------------------------------------------------------------
#
# Motivation (BASELINE.md r2 profile): at 640x640 the standard conv1 block is
# the single most expensive region of the detect graph (~31% of step time)
# because every tensor has <=64 channels — conv1_1's 3 input channels starve
# the 128x128 MXU (measured 6.7 TF/s), and 64-channel activations fill only
# half of the 128 TPU vector lanes, wasting half the HBM bandwidth AND half
# the MXU output columns on conv1_2 and pool1.
#
# TPU-native fix: run the whole block on the half-resolution grid with 2x2
# pixel phases packed into channels (space-to-depth), so every conv is
# channel-dense:
#   conv1_1': 4x4 stride-2 conv, 3 -> 256 = 4 phases x 64 == conv1_1 with
#             the space-to-depth folded in (input read once, natural layout;
#             an explicit packing pass cost 1.8-5.7 ms in measured variants)
#   conv1_2': 2x2 conv, 256 -> 256 (per-phase windows), pad 1 on every side
#   pool1:    max over the 4 phase groups with the per-phase (py, px) output
#             offsets -> (B, H/2, W/2, 64), i.e. pool1's stride-2 windows ARE
#             the phases — the 640² activation is never materialized.
#
# The packed kernels are built from the UNCHANGED conv1_1/conv1_2 parameters
# at trace time (a few dozen static .at[].set's on small arrays), so
# checkpoints, the TF importer, and training are oblivious to the layout.
# Each original kernel tap maps to exactly one packed slot; the extra slots
# are zero, so outputs equal the standard path up to f32 accumulation order
# (parity-tested in tests/unit/test_model.py).


def _pack_conv_kernel_stride2(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, ci, co) -> (4, 4, ci, 4*co): the original stride-1 3x3 conv
    as ONE stride-2 4x4 conv whose output channels are the 2x2 pixel
    phases — the space-to-depth packing is folded into the conv itself, so
    the input is read once in its natural layout and no packing pass ever
    materializes.  With padding ((1,2),(1,2)) output block Y covers input
    rows 2Y-1..2Y+2; output phase py's tap dy lands at window row py+dy.
    """
    _, _, ci, co = k.shape
    kp = jnp.zeros((4, 4, ci, 4 * co), k.dtype)
    for py in range(2):
        for px in range(2):
            go = py * 2 + px
            for dy in range(3):
                for dx in range(3):
                    kp = kp.at[
                        py + dy, px + dx, :, go * co : (go + 1) * co
                    ].set(k[dy, dx])
    return kp


def _pack_conv_kernel_2x2_phase(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, ci, co) -> (2, 2, 4*ci, 4*co) for the conv1_2' + pool fusion.

    With explicit ((1,1),(1,1)) padding a 2x2 conv output index Y covers
    input blocks {Y-1, Y}; phase py needs blocks {Y-1+py, Y+py}, i.e. the
    conv result read at index Y+py — kernel slot s = qy + 1 - py.
    """
    _, _, ci, co = k.shape
    kp = jnp.zeros((2, 2, 4 * ci, 4 * co), k.dtype)
    for py in range(2):
        for px in range(2):
            for dy in range(3):
                for dx in range(3):
                    ty, tx = py + dy - 1, px + dx - 1
                    qy, ry = ty // 2, ty % 2
                    qx, rx = tx // 2, tx % 2
                    gi, go = ry * 2 + rx, py * 2 + px
                    kp = kp.at[
                        qy + 1 - py,
                        qx + 1 - px,
                        gi * ci : (gi + 1) * ci,
                        go * co : (go + 1) * co,
                    ].set(k[dy, dx])
    return kp


def _phase_slices(r: jnp.ndarray, co: int):
    """The four (B, H, W, co) pixel-phase views of the packed conv output
    r (B, H+1, W+1, 4*co): phase (py, px) is valid at spatial offset
    (py, px) and lives in channel group py*2+px."""
    hh, ww = r.shape[1] - 1, r.shape[2] - 1
    return [
        r[:, py : py + hh, px : px + ww, (py * 2 + px) * co : (py * 2 + px + 1) * co]
        for py in range(2)
        for px in range(2)
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _phase_pool(r: jnp.ndarray, b2: jnp.ndarray, pallas_bwd=False) -> jnp.ndarray:
    """pool1 over the packed conv1_2 phases: relu(max_phases(r) + b2).

    Identical to max_phases(relu(r + b2)) — float max commutes exactly with
    the monotone same-addend add and relu — but with ONE bias/relu.  The
    hand-written VJP below replaces autodiff's nested-maximum backward,
    which materialized ~6 full-size pred masks and re-read the 4x-channel
    conv output repeatedly (measured ~8.7 ms/step of a 74 ms train step at
    batch 8; the custom backward is a single fused pass).
    """
    s = _phase_slices(r, b2.shape[0])
    m = jnp.maximum(jnp.maximum(s[0], s[1]), jnp.maximum(s[2], s[3]))
    return jax.nn.relu(m + b2)


def _phase_pool_fwd(r, b2, pallas_bwd=False):
    s = _phase_slices(r, b2.shape[0])
    m = jnp.maximum(jnp.maximum(s[0], s[1]), jnp.maximum(s[2], s[3]))
    out = jax.nn.relu(m + b2)
    # uint8 winner-phase index (first phase achieving the max, py*2+px
    # order), 255 where relu clamps.  This one small residual encodes the
    # entire backward routing — the backward never re-reads the 4x-channel
    # conv output r (422 MB at batch 8), only (winner, cotangent).
    win = jnp.where(
        s[0] == m,
        jnp.uint8(0),
        jnp.where(
            s[1] == m,
            jnp.uint8(1),
            jnp.where(s[2] == m, jnp.uint8(2), jnp.uint8(3)),
        ),
    )
    win = jnp.where(out > 0, win, jnp.uint8(255))
    return out, (win, b2)


def _phase_pool_bwd_xla(win, g):
    """XLA assembly of the r-cotangent: route g to the winning phase's
    channel group at its spatial offset.  Assembly formulation (measured
    both ways on v5e, batch 16): pad+concat costs one extra materialized
    fusion of the 4 padded operands (~0.84 GB traffic), but a
    channel-disjoint dynamic-update-slice chain is FAR worse — XLA:TPU
    lowers each DUS on a bf16[16,321,321,256]{3,0,2,1} buffer as an
    unfused full-buffer copy (22.6 + 22.6 + 6.2 = 51.4 ms/step, the whole
    train step regressing 124 -> 176 ms), so pad+concat stays as the
    best *XLA* formulation; the Pallas kernel below replaces it where
    available (ops/phase_pool_pallas.py — one pass instead of two)."""
    groups = []
    for py in range(2):
        for px in range(2):
            contrib = jnp.where(win == py * 2 + px, g, 0).astype(g.dtype)
            groups.append(
                jnp.pad(contrib, ((0, 0), (py, 1 - py), (px, 1 - px), (0, 0)))
            )
    return jnp.concatenate(groups, axis=-1)


def _phase_pool_bwd(pallas_bwd, res, g):
    win, b2 = res
    # Route to the first phase (py, px order) achieving the max — a valid
    # subgradient; ties differ from nested-maximum autodiff only on exact
    # float ties between phases.
    if pallas_bwd:
        from dan_tpu.ops.phase_pool_pallas import phase_pool_bwd_pallas

        if isinstance(pallas_bwd, tuple):
            # (Mesh, axis): the batch dim is sharded — run the custom call
            # per-shard inside a shard_map island (GSPMD cannot partition
            # it; check_vma=False for the same reason as the matcher island
            # in train/loop.py).  Safe here because nothing differentiates
            # through the backward itself.
            import jax
            from jax.sharding import PartitionSpec as P

            mesh, axis = pallas_bwd
            gr = jax.shard_map(
                phase_pool_bwd_pallas,
                mesh=mesh,
                in_specs=(P(axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )(g, win)
        else:
            gr = phase_pool_bwd_pallas(g, win)
    else:
        gr = _phase_pool_bwd_xla(win, g)
    gb2 = (
        jnp.sum(
            jnp.where(win != 255, g, 0).astype(jnp.float32), axis=(0, 1, 2)
        ).astype(b2.dtype)
    )
    return gr, gb2


_phase_pool.defvjp(_phase_pool_fwd, _phase_pool_bwd)


def _raw_conv12(o1: jnp.ndarray, k2: jnp.ndarray) -> jnp.ndarray:
    """The packed conv1_2': SAME-padded 2x2 conv on the phase grid."""
    return jax.lax.conv_general_dilated(
        o1, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv12(o1_pre: jnp.ndarray, k2: jnp.ndarray, wgrad_mode=False) -> jnp.ndarray:
    """relu -> conv1_2', with an OWNED weight gradient.

    Backward note (r2/r3/r4 history): XLA:TPU's weight-grad lowering of
    this conv inserts a standalone `reverse` of the 844 MB cotangent
    (2.49 ms/step at batch 16) — the batch-contraction conv operand-swaps
    the correlation, which needs one reversed operand.  r2's custom-VJP
    *conv reformulations* (pre-flipped-kernel dgrad; CHWN/IHWO wgrad)
    could not remove it (identical step time), and r4 probes showed a
    pre-reversed cotangent merely moves the reverse to the dgrad (the two
    consumers want opposite orientations).  The r4 fix: OWN the wgrad in
    a Pallas kernel that reads both operands in natural order
    (ops/conv12_wgrad_pallas.py) — no reverse exists anywhere.  The input
    grad stays on XLA's own lowering (jax.vjp), which consumes the
    cotangent directly with no reverse.

    The boundary includes conv1_1''s relu so the kernel can take the
    PRE-relu conv output (materialized in the train graph anyway — a pure
    bitcast operand) and apply relu on the VPU: a post-relu operand made
    XLA materialize an 838 MB relu copy for the custom call (+2.54
    ms/step measured; allow_input_fusion did not elide it).

    wgrad_mode: False = XLA-twin weight grad (jax.vjp — identical math to
    autodiff); True = Pallas kernel; (Mesh, axis) = Pallas kernel inside a
    shard_map island over the sharded batch axis with a psum (the wgrad
    contracts over batch).
    """
    return _raw_conv12(jax.nn.relu(o1_pre), k2)


def _conv12_fwd(o1_pre, k2, wgrad_mode=False):
    return _raw_conv12(jax.nn.relu(o1_pre), k2), (o1_pre, k2)


def _conv12_bwd(wgrad_mode, res, dr):
    o1_pre, k2 = res
    # Input grad (and the relu mask) on XLA's own lowering — identical
    # composition to autodiff, no reverse on this side.
    _, dgrad_fn = jax.vjp(lambda a: _raw_conv12(jax.nn.relu(a), k2), o1_pre)
    do1_pre = dgrad_fn(dr)[0]
    if wgrad_mode:
        from dan_tpu.ops.conv12_wgrad_pallas import conv12_wgrad_pallas

        if isinstance(wgrad_mode, tuple):
            from jax.sharding import PartitionSpec as P

            mesh, axis = wgrad_mode

            def _wg(a, d):
                return jax.lax.psum(
                    conv12_wgrad_pallas(a, d, relu_input=True), axis
                )

            dk2 = jax.shard_map(
                _wg,
                mesh=mesh,
                in_specs=(P(axis), P(axis)),
                out_specs=P(),
                check_vma=False,
            )(o1_pre, dr)
        else:
            dk2 = conv12_wgrad_pallas(o1_pre, dr, relu_input=True)
        dk2 = dk2.astype(k2.dtype)
    else:
        _, wgrad_fn = jax.vjp(
            lambda k: _raw_conv12(jax.nn.relu(o1_pre), k), k2
        )
        dk2 = wgrad_fn(dr)[0]
    return do1_pre, dk2


_conv12.defvjp(_conv12_fwd, _conv12_bwd)


def conv1_block_packed(
    params: Dict, x: jnp.ndarray, pallas_bwd=False, wgrad_mode=None
) -> jnp.ndarray:
    """relu(conv1_1) -> relu(conv1_2) -> maxpool2x2/2, phase-packed.

    x: (B, H, W, 3), H and W even.  Returns (B, H/2, W/2, 64) == the
    standard path's pool1 output (up to f32 accumulation order).

    pallas_bwd: False = XLA backward assembly; True = Pallas kernel;
    (Mesh, axis) = Pallas kernel inside a shard_map island over the
    sharded batch axis (see _phase_pool_bwd).
    wgrad_mode: None = plain conv1_2' (inference graphs — exact jaxpr
    stability); otherwise forwarded to _conv12 (owned weight grad).
    """
    dt = x.dtype

    k1 = _pack_conv_kernel_stride2(params["conv1_1"]["kernel"]).astype(dt)
    b1 = jnp.tile(params["conv1_1"]["bias"], 4).astype(dt)
    o1_pre = (
        jax.lax.conv_general_dilated(
            x, k1, (2, 2), ((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b1
    )  # (B, H/2, W/2, 256): conv1_1 phases, pre-relu

    k2 = _pack_conv_kernel_2x2_phase(params["conv1_2"]["kernel"]).astype(dt)
    b2 = params["conv1_2"]["bias"].astype(dt)
    # (B, H/2+1, W/2+1, 256): phase (py, px) valid at offset (py, px).
    if wgrad_mode is None:
        r = _raw_conv12(jax.nn.relu(o1_pre), k2)
    else:
        r = _conv12(o1_pre, k2, wgrad_mode)
    return _phase_pool(r, b2, pallas_bwd)
