"""Fused packed-conv1_2 + phase-pool Pallas kernel.

Why (BASELINE.md r2 batch-128 profile): the phase-packed conv1 block
(models/vgg.py::conv1_block_packed) is compute-optimal on the MXU but
HBM-bound around it — XLA materializes the packed conv1_2 output r
(B, H, W, 256) in HBM (6.75 GB at batch 128 / 640^2) and the conv2_1
fusion re-reads all of it to take the phase max: ~13.5 GB of HBM traffic
whose only purpose is to carry r between two ops.  This kernel computes
conv1_2' AND the phase-pool in one pass: r lives only in VMEM row-slabs,
HBM sees o1 once in and pool1 (64 ch) once out.

Formulation (TPU-native, no HBM im2col):
  * o1 rows are DMA'd (double-buffered across grid steps) into a
    zero-framed VMEM canvas of padded width Wp >= W+1 (multiple of the
    bf16 sublane tile, 16).  Flattening the canvas row-major makes every
    2x2-conv tap a CONSTANT flat shift — a row's right-pad zeros double
    as the next row's left zero, so the conv's own zero padding needs no
    masking and the DMA destination stays sublane-aligned.
  * The four taps are lane-concatenated in VMEM and contracted as ONE
    (m, 1024) @ (1024, 256) MXU matmul per row-slab (K=N dense — the
    whole point of the phase packing; four separate K=256 matmuls
    measured ~2x slower).
  * The phase max (pool1) is two maximums with lane rotations: phases
    live in 64-lane channel groups with (dy, dx) in {0,1}^2 spatial
    offsets; max(g0, g2-rolled-128-lanes at +Wp rows) then
    max(., .-rolled-64-lanes at +1 row) reduces all four in two steps.
  * relu(max + bias) streams straight to the (To, W, 64) output block.

Parity: bit-comparable to conv1_block_packed up to f32 accumulation
order; tested in tests/unit/test_conv1_pallas.py against the XLA path.
Inference-only (no VJP) — vgg_forward dispatches here only for inference
graphs on the TPU backend.

v2 (conv1_pool_pallas / conv1_block_packed_pallas_v2): v1 measured 25%
faster standalone but regressed in-graph because conv1_1''s XLA conv
output carries layout {3,0,2,1} while Pallas operands are row-major —
XLA inserted a 20.3 ms relayout copy of the 6.7 GB intermediate
(BASELINE.md r2).  v2 deletes both the copy and conv1_1''s own HBM
round-trip by fusing conv1_1 INTO the kernel: XLA builds a strided-slice
im2col (B, H/2, W/2, 128) — each half-res position's 4x4x3 input window
(lane-padded 48 -> 128 for Mosaic DMA alignment), an elementwise fusion
whose output layout follows the consumer for free — and the kernel
contracts it with the packed conv1_1' weights
(one K=128 MXU matmul per row-slab) straight into the zero-framed VMEM
canvas, then runs the v1 conv1_2' + phase-pool body on it.  HBM sees the
image once (as the 4x-expanded im2col) in and pool1 once out.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB = 16  # bf16 sublane tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _lroll(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Left-rotate lanes: out[:, i] = x[:, i + k (mod lanes)].  Written as
    a concat (vreg-boundary rotations are free; 64-lane ones one shuffle)
    so it also runs under interpret mode."""
    return jnp.concatenate([x[:, k:], x[:, :k]], axis=1)


def _conv2_pool_body(F, w_ref, b2_ref, rs, out_ref, *, W, Wp, To, n_slabs):
    """Shared tail of both kernels: packed conv1_2' over the flattened
    zero-framed canvas F ((To+4)*Wp, 256) into rs, then the phase-pool
    into this tile's out_ref block.  See the module docstring for the
    flat-shift / lane-rotation formulation."""
    # --- conv1_2' as TWO K=512 im2col matmuls per M-slab: taps with the
    # same flat shift parity are lane-concatenated (Mosaic can only concat
    # values with MATCHING sublane offsets, so the -1-shifted pair and the
    # 0-shifted pair stay separate), giving dense MXU contractions (many
    # small K=256 matmuls measured ~2x slower).
    # r(j, x) = rs[j*Wp + x] = sum_s F[Wp + j*Wp + x + off_s] @ W_s with
    # off in {-1, 0, Wp-1, Wp} (the leading Wp skips the zero row).
    L = (To + 1) * Wp + 2 * _SUB
    w_m1 = w_ref[0:512, :]  # [W00; W10]: the off -1 / Wp-1 taps
    w_p0 = w_ref[512:1024, :]  # [W01; W11]: the off 0 / Wp taps
    m = _round_up(-(-L // n_slabs), _SUB)
    for h in range(n_slabs):
        size = min(m, L - h * m)
        base = h * m + Wp
        e_m1 = jnp.concatenate(
            [
                F[base - 1 : base - 1 + size],
                F[base + Wp - 1 : base + Wp - 1 + size],
            ],
            axis=1,
        )
        e_p0 = jnp.concatenate(
            [F[base : base + size], F[base + Wp : base + Wp + size]], axis=1
        )
        acc = jnp.dot(e_m1, w_m1, preferred_element_type=jnp.float32)
        acc += jnp.dot(e_p0, w_p0, preferred_element_type=jnp.float32)
        rs[h * m : h * m + size, :] = acc.astype(jnp.bfloat16)

    # --- phase-pool in 8-row slabs: pool(j, x, c) = relu(b2[c] + max of
    #   r(j, x)[c], r(j, x+1)[64+c], r(j+1, x)[128+c], r(j+1, x+1)[192+c])
    # with r(j, x) = rs[j*Wp + x].
    bias = b2_ref[0:1, :]
    lv = 8 * Wp + 2 * _SUB
    lw = 8 * Wp
    for jj in range(To // 8):
        q0 = jj * 8 * Wp
        v = jnp.maximum(
            rs[q0 : q0 + lv, :], _lroll(rs[q0 + Wp : q0 + Wp + lv, :], 128)
        )
        wv = jnp.maximum(v[0:lw, :], _lroll(v[1 : 1 + lw, :], 64))
        for jl in range(8):
            row = wv[jl * Wp : jl * Wp + W, :]
            out_ref[0, jj * 8 + jl, :, :] = jax.nn.relu(row + bias)[:, 0:64]


def _kernel(
    o1_hbm,  # (B, H, W, 256) bf16, HBM/ANY
    w_ref,  # (1024, 256) bf16 VMEM: [W00; W01; W10; W11]
    b2_ref,  # (1, 256) bf16 VMEM: conv1_2 bias in lanes [0:64), zeros after
    out_ref,  # (1, To, W, 64) bf16 block
    f3,  # (2, To+4, Wp, 256) bf16 scratch: double-buffered zero-framed rows
    rs,  # (L, 256) bf16 scratch: r_flat for this tile
    sems,  # (2,) DMA semaphores, one per slot
    *,
    H: int,
    W: int,
    To: int,
    Wp: int,
    n_slabs: int,
):
    # Canvas layout (per slot): row 0 is a PERMANENT zero row (it supplies
    # the -1 flat-shift tap of the first r row); row 1+i holds o1 row
    # t*To-1+i with its data at columns [0, W).  Row To+3 backs the
    # over-length tail of the +Wp tap slices; zeroed once, never written.
    #
    # DMA is double-buffered across grid steps: step s waits on slot s%2
    # (issued by step s-1) and prefetches step s+1 into the other slot, so
    # the HBM reads ride under the matmuls.
    b = pl.program_id(0)
    t = pl.program_id(1)
    T = H // To
    n_img = pl.num_programs(0)
    step = b * T + t
    cur = jax.lax.rem(step, 2)
    nxt = 1 - cur

    def _copy(slot, bb, lo, d0, n):
        return pltpu.make_async_copy(
            o1_hbm.at[bb, pl.ds(lo, n), :, :],
            f3.at[slot, pl.ds(d0, n), pl.ds(0, W), :],
            sems.at[slot],
        )

    def _dma(slot, bb, tt, start):
        """Start (or wait on) the DMA for tile (bb, tt) into `slot`."""

        def go(dma):
            dma.start() if start else dma.wait()

        if T == 1:
            go(_copy(slot, bb, 0, 2, To))
        else:

            @pl.when(tt == 0)
            def _():
                go(_copy(slot, bb, 0, 2, To + 1))

            @pl.when((tt > 0) & (tt < T - 1))
            def _():
                go(_copy(slot, bb, tt * To - 1, 1, To + 2))

            @pl.when((tt == T - 1) & (tt > 0))
            def _():
                go(_copy(slot, bb, tt * To - 1, 1, To + 1))

    @pl.when(step == 0)
    def _():
        for s in range(2):
            f3[s, 0, :, :] = jnp.zeros((Wp, 256), jnp.bfloat16)
            f3[s, 1:, W:, :] = jnp.zeros((To + 3, Wp - W, 256), jnp.bfloat16)
            f3[s, To + 3, :, :] = jnp.zeros((Wp, 256), jnp.bfloat16)
        _dma(cur, b, t, start=True)

    has_next = (t < T - 1) | (b < n_img - 1)
    t_n = jnp.where(t < T - 1, t + 1, 0)
    b_n = jnp.where(t < T - 1, b, b + 1)

    @pl.when(has_next)
    def _():
        _dma(nxt, b_n, t_n, start=True)

    _dma(cur, b, t, start=False)  # wait for this tile's rows

    @pl.when(t == 0)
    def _():
        f3[cur, 1, 0:W, :] = jnp.zeros((W, 256), jnp.bfloat16)

    @pl.when(t == T - 1)
    def _():
        f3[cur, To + 2, 0:W, :] = jnp.zeros((W, 256), jnp.bfloat16)

    F = f3[cur, :, :, :].reshape((To + 4) * Wp, 256)
    _conv2_pool_body(
        F, w_ref, b2_ref, rs, out_ref, W=W, Wp=Wp, To=To, n_slabs=n_slabs
    )


@functools.partial(jax.jit, static_argnames=("to_rows", "n_slabs", "interpret"))
def conv12_pool_pallas(
    o1: jnp.ndarray,
    w_cat: jnp.ndarray,
    b2: jnp.ndarray,
    to_rows: int = 0,
    n_slabs: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W, 256) packed relu(conv1_1') output -> (B, H, W, 64) pool1.

    w_cat: (1024, 256) = the packed 2x2 conv1_2' kernel
    (models/vgg.py::_pack_conv_kernel_2x2_phase) reshaped row-major, i.e.
    [W00; W01; W10; W11] stacked along rows.  b2: (64,) conv1_2 bias.
    """
    bsz, h, w, c = o1.shape
    assert c == 256 and w_cat.shape == (1024, 256)
    if to_rows == 0:  # best measured tile (BASELINE.md r2): 16 rows
        to_rows = 16 if h % 16 == 0 else 8
    assert h % to_rows == 0 and to_rows % 8 == 0, (h, to_rows)
    assert w % 8 == 0 and w >= 16, w  # aligned DMA dst; Wp >= 32 headroom
    wp = _round_up(w + 1, _SUB)
    l_flat = (to_rows + 1) * wp + 2 * _SUB

    b2_row = jnp.zeros((1, 256), jnp.bfloat16).at[0, :64].set(
        b2.astype(jnp.bfloat16)
    )
    # Reorder tap blocks to the kernel's pairing: [W00; W10] (the -1
    # flat-shift pair) then [W01; W11] (the 0-shift pair).
    w_ord = jnp.concatenate(
        [w_cat[0:256], w_cat[512:768], w_cat[256:512], w_cat[768:1024]], axis=0
    )
    kernel = functools.partial(
        _kernel, H=h, W=w, To=to_rows, Wp=wp, n_slabs=n_slabs
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz, h // to_rows),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, 64), jnp.bfloat16),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, to_rows, w, 64), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, to_rows + 4, wp, 256), jnp.bfloat16),
            pltpu.VMEM((l_flat, 256), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(o1.astype(jnp.bfloat16), w_ord.astype(jnp.bfloat16), b2_row)


# ---------------------------------------------------------------------------
# v2: conv1_1 fused into the kernel via an XLA-built strided im2col input
# ---------------------------------------------------------------------------


def _im2col_s2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) image -> (B, H/2, W/2, 48) half-res patches.

    Channel (wy*4 + wx)*3 + c holds padded-input pixel (2y + wy - 1,
    2x + wx - 1, c): exactly the 4x4 window of the stride-2 packed conv1_1'
    (padding ((1,2),(1,2)), models/vgg.py::_pack_conv_kernel_stride2), so
    the conv becomes `patches @ kp.reshape(48, 256)`.  Built from 16
    strided slices — one elementwise XLA fusion whose output layout
    follows its (Pallas, row-major) consumer, unlike a conv result.

    Channels 48..128 are zero: Mosaic requires DMA slice lane dims to be
    128-aligned (a 48-lane memref_slice aborts the compile), and the VMEM
    scratch is lane-padded to 128 regardless, so the pad costs only the
    zero-lane HBM bytes (2.67x this tensor; ~+5 ms/batch-128 at 640^2,
    dwarfed by the ~40 ms of conv1_1/relayout traffic v2 deletes) plus a
    free-in-practice K=128-vs-48 MXU matmul.
    """
    b, h, w, c = x.shape
    assert c == 3 and h % 2 == 0 and w % 2 == 0
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
    cols = [
        xp[:, wy : wy + h : 2, wx : wx + w : 2, :]
        for wy in range(4)
        for wx in range(4)
    ]
    out = jnp.concatenate(cols, axis=-1)
    return jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, 128 - 48)))


def _kernel_v2(
    im_hbm,  # (B, H, W, 128) bf16, HBM/ANY: _im2col_s2 output (half-res grid)
    w1_ref,  # (128, 256) bf16 VMEM: packed conv1_1' kernel (rows 48+ zero)
    b1_ref,  # (1, 256) bf16 VMEM: conv1_1 bias tiled over the 4 phase groups
    w2_ref,  # (1024, 256) bf16 VMEM: [W00; W10; W01; W11] (kernel pairing)
    b2_ref,  # (1, 256) bf16 VMEM: conv1_2 bias in lanes [0:64), zeros after
    out_ref,  # (1, To, W, 64) bf16 block
    imbuf,  # (2, To+2, Wp, 128) bf16 scratch: double-buffered im2col rows
    f3,  # (To+4, Wp, 256) bf16 scratch: zero-framed o1 canvas (computed)
    rs,  # (L, 256) bf16 scratch: r_flat for this tile
    sems,  # (2,) DMA semaphores, one per slot
    *,
    H: int,
    W: int,
    To: int,
    Wp: int,
    n_slabs: int,
    rh: int,
):
    # Canvas row 1+i holds o1 row t*To-1+i (row 0 / To+3 are permanent
    # zeros, as in v1) — but o1 is now COMPUTED in-kernel from imbuf row i
    # (same o1-row indexing, one less leading row), so only the 48-channel
    # im2col rows ride the DMA (5.3x less traffic than v1's o1 rows) and
    # f3 needs no double buffer.  Boundary rows with no DMA'd source row
    # produce garbage that the explicit zero-row writes below overwrite.
    b = pl.program_id(0)
    t = pl.program_id(1)
    T = H // To
    n_img = pl.num_programs(0)
    step = b * T + t
    cur = jax.lax.rem(step, 2)
    nxt = 1 - cur

    def _copy(slot, bb, lo, d0, n):
        return pltpu.make_async_copy(
            im_hbm.at[bb, pl.ds(lo, n), :, :],
            imbuf.at[slot, pl.ds(d0, n), pl.ds(0, W), :],
            sems.at[slot],
        )

    def _dma(slot, bb, tt, start):
        def go(dma):
            dma.start() if start else dma.wait()

        if T == 1:
            go(_copy(slot, bb, 0, 1, To))
        else:

            @pl.when(tt == 0)
            def _():
                go(_copy(slot, bb, 0, 1, To + 1))

            @pl.when((tt > 0) & (tt < T - 1))
            def _():
                go(_copy(slot, bb, tt * To - 1, 0, To + 2))

            @pl.when((tt == T - 1) & (tt > 0))
            def _():
                go(_copy(slot, bb, tt * To - 1, 0, To + 1))

    @pl.when(step == 0)
    def _():
        f3[0, :, :] = jnp.zeros((Wp, 256), jnp.bfloat16)
        f3[To + 3, :, :] = jnp.zeros((Wp, 256), jnp.bfloat16)
        _dma(cur, b, t, start=True)

    has_next = (t < T - 1) | (b < n_img - 1)
    t_n = jnp.where(t < T - 1, t + 1, 0)
    b_n = jnp.where(t < T - 1, b, b + 1)

    @pl.when(has_next)
    def _():
        _dma(nxt, b_n, t_n, start=True)

    _dma(cur, b, t, start=False)  # wait for this tile's im2col rows

    # --- conv1_1': canvas rows 1..To+2 = relu(im2col @ W1 + b1), one K=128
    # MXU matmul per rh-row slab (loaded per slab to keep peak scoped-VMEM
    # under the 16 MB limit at to_rows=16 — a whole-buffer load was 48 KB
    # over), stored as one reshaped (rh, Wp, 256) write per slab.
    R = To + 2
    b1 = b1_ref[0:1, :]
    for h in range(R // rh):
        slab = imbuf[cur, h * rh : (h + 1) * rh, :, :].reshape(rh * Wp, 128)
        o = jnp.dot(slab, w1_ref[:, :], preferred_element_type=jnp.float32)
        o = jax.nn.relu(o + b1).astype(jnp.bfloat16)
        f3[1 + h * rh : 1 + (h + 1) * rh, :, :] = o.reshape(rh, Wp, 256)

    # --- restore the zero frame the matmul just overwrote: padded columns
    # [W, Wp) (imbuf's pad columns are never DMA'd -> relu(garbage@W1+b1)
    # landed there) and the two boundary rows outside the image.
    for i in range(R):
        f3[1 + i, W:, :] = jnp.zeros((Wp - W, 256), jnp.bfloat16)

    @pl.when(t == 0)
    def _():
        f3[1, :, :] = jnp.zeros((Wp, 256), jnp.bfloat16)

    @pl.when(t == T - 1)
    def _():
        f3[To + 2, :, :] = jnp.zeros((Wp, 256), jnp.bfloat16)

    F = f3[:, :, :].reshape((To + 4) * Wp, 256)
    _conv2_pool_body(
        F, w2_ref, b2_ref, rs, out_ref, W=W, Wp=Wp, To=To, n_slabs=n_slabs
    )


@functools.partial(jax.jit, static_argnames=("to_rows", "n_slabs", "interpret"))
def conv1_pool_pallas(
    im: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w_cat: jnp.ndarray,
    b2: jnp.ndarray,
    to_rows: int = 0,
    n_slabs: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W, 128) im2col patches -> (B, H, W, 64) pool1 (H, W half-res).

    im: _im2col_s2 output (channels 48.. are zero — lane-alignment pad).
    w1: (48, 256) packed conv1_1' kernel (_pack_conv_kernel_stride2
    reshaped row-major; zero-extended to (128, 256) here); b1: (64,)
    conv1_1 bias.  w_cat / b2: as conv12_pool_pallas.
    """
    bsz, h, w, c = im.shape
    assert c == 128 and w1.shape == (48, 256) and w_cat.shape == (1024, 256)
    w1 = jnp.zeros((128, 256), w1.dtype).at[:48, :].set(w1)
    if to_rows == 0:
        # Unlike v1, default to 8-row tiles: at to_rows=16 the extra
        # VMEM operands (w1 + bias rows) put peak scoped VMEM 48 KB over
        # the 16 MB limit at W=320 (measured ~3% slower at 8 in the v1
        # sweep; a VMEM diet — (48, 256) w1 operand + trimmed rs margin —
        # would recover to16 if the kernel ever goes default-on).
        to_rows = 8 if h % 8 == 0 else 16
    assert h % to_rows == 0 and to_rows % 8 == 0, (h, to_rows)
    assert w % 8 == 0 and w >= 16, w
    wp = _round_up(w + 1, _SUB)
    l_flat = (to_rows + 1) * wp + 2 * _SUB
    R = to_rows + 2
    rh = next(r for r in (6, 5, 4, 3, 2, 1) if R % r == 0)

    b1_row = jnp.tile(b1.astype(jnp.bfloat16), 4).reshape(1, 256)
    b2_row = jnp.zeros((1, 256), jnp.bfloat16).at[0, :64].set(
        b2.astype(jnp.bfloat16)
    )
    w_ord = jnp.concatenate(
        [w_cat[0:256], w_cat[512:768], w_cat[256:512], w_cat[768:1024]], axis=0
    )
    kernel = functools.partial(
        _kernel_v2, H=h, W=w, To=to_rows, Wp=wp, n_slabs=n_slabs, rh=rh
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz, h // to_rows),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, 64), jnp.bfloat16),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, to_rows, w, 64), lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R, wp, 128), jnp.bfloat16),
            pltpu.VMEM((to_rows + 4, wp, 256), jnp.bfloat16),
            pltpu.VMEM((l_flat, 256), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        im.astype(jnp.bfloat16),
        w1.astype(jnp.bfloat16),
        b1_row,
        w_ord.astype(jnp.bfloat16),
        b2_row,
    )


def conv1_block_packed_pallas_v2(
    params: Dict, x: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in for models/vgg.py::conv1_block_packed on the inference
    path, v2: the WHOLE conv1 block (conv1_1 + conv1_2 + pool1) runs in
    one Pallas kernel; XLA only builds the (B, H/2, W/2, 48) im2col."""
    from dan_tpu.models.vgg import (
        _pack_conv_kernel_2x2_phase,
        _pack_conv_kernel_stride2,
    )

    dt = jnp.bfloat16
    im = _im2col_s2(x.astype(dt))
    w1 = _pack_conv_kernel_stride2(params["conv1_1"]["kernel"]).astype(
        dt
    ).reshape(48, 256)
    k2 = _pack_conv_kernel_2x2_phase(params["conv1_2"]["kernel"])
    return conv1_pool_pallas(
        im,
        w1,
        params["conv1_1"]["bias"],
        k2.reshape(1024, 256),
        params["conv1_2"]["bias"],
        interpret=interpret,
    )


def conv1_block_packed_pallas(
    params: Dict, x: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in for models/vgg.py::conv1_block_packed on the inference
    path: XLA computes the stride-2 4x4 conv1_1' (input read once, in its
    natural layout); the Pallas kernel fuses conv1_2' with the phase-pool
    so the 4x-channel intermediate never touches HBM."""
    from dan_tpu.models.vgg import (
        _pack_conv_kernel_2x2_phase,
        _pack_conv_kernel_stride2,
    )

    dt = jnp.bfloat16
    k1 = _pack_conv_kernel_stride2(params["conv1_1"]["kernel"]).astype(dt)
    b1 = jnp.tile(params["conv1_1"]["bias"], 4).astype(dt)
    o1 = jax.lax.conv_general_dilated(
        x.astype(dt), k1, (2, 2), ((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    o1 = jax.nn.relu(o1 + b1)  # (B, H/2, W/2, 256)
    k2 = _pack_conv_kernel_2x2_phase(params["conv1_2"]["kernel"])
    w_cat = k2.reshape(1024, 256)
    return conv12_pool_pallas(
        o1, w_cat, params["conv1_2"]["bias"], interpret=interpret
    )
