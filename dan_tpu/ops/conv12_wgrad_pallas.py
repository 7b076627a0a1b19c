"""Pallas TPU kernel for the packed conv1_2' WEIGHT gradient.

Why a kernel (BASELINE.md round-3 floor analysis, the one unprobed lever):
XLA:TPU's weight-grad lowering of the packed conv1_2'
(o1 (B,320,320,256) x dr (B,321,321,256) -> dW (2,2,256,256)) inserts a
standalone `reverse` of the 844 MB cotangent (dims {0,1} of the
(H,W,B,C)-layout view) before the batch-contraction conv — 2.49 ms/step of
pure HBM traffic at batch 16 (docs/profiles/prof_train_b16_r3.txt).  Probes
(r4): feeding the wgrad a pre-reversed cotangent cancels the reverse
(0 reverse ops), but the dgrad then materializes the un-reversal — the two
consumers want opposite orientations, so no single-orientation tensor
serves both.  This kernel removes the reverse outright: it owns the wgrad
as a direct correlation, reading BOTH operands in natural order.

    dW[kh,kw,gi,go] = sum_{b,y,x} o1p[b, y-1+kh, x-1+kw, gi] * dr[b,y,x,go]

Formulation: grid (H+1, B/bblk); step (y, p) contracts cotangent row y of
batch-block p against o1 rows y-1 (kh=0) and y (kh=1), as ONE wide
(W+1)*bblk-deep MXU matmul (the four (kh,kw) taps stacked on the lane
axis; each x shift is a zero-column concat), accumulated into a (4C, C)
f32 VMEM scratch and emitted once at the last step.  Spatial padding is handled
in-kernel (zero columns; row-validity predicates), so the padded o1 is
never materialized.  Like the phase-pool kernel, it runs on
(H, W, B, C)-transposed views — bitcasts of the train graph's
{3,0,2,1:T(8,128)} NHWC layout, so no relayout copies appear around the
custom call.

The accumulator carries across grid steps, so BOTH grid dimensions must be
sequential ('arbitrary' semantics, stated explicitly).

Reference semantics: jax.vjp of the conv w.r.t. the kernel — parity-tested
against it (f32 accumulation in a different order: allclose, not
bit-identical).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Same interpret-mode convention as phase_pool_pallas (flipped by tests /
# DAN_DRYRUN_PALLAS=interpret to emulate on CPU).
INTERPRET = False

_BBLK = 8  # batch rows per grid step (sublane tile)


def _kernel(
    dr_ref, o1_prev_ref, o1_cur_ref, out_ref, acc_ref, *, h, ci, co, nb, relu
):
    y = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when((y == 0) & (p == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w1 = dr_ref.shape[1]  # W + 1
    bblk = dr_ref.shape[2]
    d = dr_ref[...].reshape(w1 * bblk, co)  # (K, C_go)

    zc = jnp.zeros((1, 1, bblk, ci), o1_cur_ref.dtype)
    taps = [(0, o1_prev_ref, y >= 1), (1, o1_cur_ref, y <= h - 1)]
    shifted = []
    for kh, ref, row_ok in taps:
        row = ref[...]  # (1, W, bblk, CI) = o1 row y-1+kh (garbage when !ok)
        if relu:
            # The caller hands the PRE-relu conv1_1' output (materialized
            # in the train graph anyway, so the operand is a pure bitcast)
            # and the relu runs here on the VPU — a post-relu operand
            # forces XLA to materialize an 838 MB relu copy just for this
            # custom call (+2.54 ms/step measured; allow_input_fusion did
            # not elide it).
            row = jnp.maximum(row, jnp.zeros_like(row))
        row = jnp.where(row_ok, row, jnp.zeros_like(row))
        # o1p[.., x-1+kw, ..] for x in [0, W+1): kw=0 prepends the zero
        # column, kw=1 appends it.
        shifted.append(jnp.concatenate([zc, row], axis=1))
        shifted.append(jnp.concatenate([row, zc], axis=1))
    # One wide MXU matmul per grid step instead of four: stack the
    # (kh, kw) taps on the lane axis -> (K, 4*CI) x (K, CO).
    a_full = jnp.concatenate(shifted, axis=3).reshape(w1 * bblk, 4 * ci)
    acc_ref[...] += jax.lax.dot_general(
        a_full,
        d,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (4*C_gi, C_go), rows blocked (kh*2+kw)-major

    @pl.when((y == h) & (p == nb - 1))
    def _emit():
        out_ref[...] = acc_ref[...]


def conv12_wgrad_pallas(
    o1: jnp.ndarray,
    dr: jnp.ndarray,
    interpret: bool | None = None,
    relu_input: bool = False,
) -> jnp.ndarray:
    """o1 (B, H, W, CI) activation + dr (B, H+1, W+1, CO) cotangent ->
    dW (2, 2, CI, CO) weight gradient of the SAME-padded 2x2 conv, f32.

    relu_input=True: o1 is the PRE-relu value and relu is applied inside
    the kernel (the production path — see the kernel comment).

    Requires B % 8 == 0 (sublane batch blocks); callers dispatch to the
    XLA twin (jax.vjp of the conv) otherwise.
    """
    if interpret is None:
        interpret = INTERPRET
    b, h, w, ci = o1.shape
    co = dr.shape[-1]
    assert dr.shape == (b, h + 1, w + 1, co), (o1.shape, dr.shape)
    assert b % _BBLK == 0, f"batch {b} not a multiple of {_BBLK}"
    nb = b // _BBLK

    o1t = jnp.transpose(o1, (1, 2, 0, 3))  # (H, W, B, CI) — bitcast
    drt = jnp.transpose(dr, (1, 2, 0, 3))

    dr_spec = pl.BlockSpec((1, w + 1, _BBLK, co), lambda y, p: (y, 0, p, 0))
    o1_prev = pl.BlockSpec(
        (1, w, _BBLK, ci), lambda y, p: (jnp.maximum(y - 1, 0), 0, p, 0)
    )
    o1_cur = pl.BlockSpec(
        (1, w, _BBLK, ci), lambda y, p: (jnp.minimum(y, h - 1), 0, p, 0)
    )
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, ci=ci, co=co, nb=nb, relu=relu_input),
        grid=(h + 1, nb),
        in_specs=[dr_spec, o1_prev, o1_cur],
        out_specs=pl.BlockSpec((4 * ci, co), lambda y, p: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((4 * ci, co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4 * ci, co), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # Measured r4: this flag alone did NOT make XLA fuse the relu
            # producer into the operand windows (the 838 MB relu copy
            # stayed) — the relu_input mode above is the actual fix; the
            # flag is kept as a no-cost fusion opportunity for XLA.
            allow_input_fusion=(False, True, True),
        ),
        interpret=interpret,
    )(drt, o1t, o1t)
    # acc rows are (kh*2+kw)-major: (4*C_gi, C_go) -> (2, 2, C_gi, C_go).
    return out.reshape(2, 2, ci, co)
