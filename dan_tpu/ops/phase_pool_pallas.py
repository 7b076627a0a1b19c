"""Pallas TPU kernel for the phase-pool backward assembly.

The custom-VJP backward of `models/vgg.py::_phase_pool` routes the pool1
cotangent g (B, H, W, C) to the winning pixel phase of the packed conv1_2
output r (B, H+1, W+1, 4C): channel group go = py*2+px receives g at
spatial offset (py, px) where the stored winner index equals go, zero
elsewhere (reference semantics: TF max-pool grad routes to the first
winner; SURVEY.md §2 'VGG-16 backbone').

Why a kernel: XLA:TPU lowers every natural formulation of this assembly
as multiple full-size HBM passes — measured at batch 16 on v5e
(BASELINE.md round-3 rows): pad+concat 7.1 ms (a 4-output select fusion
writing 4 x 210 MB, then a pad+iota-select concat fusion re-reading them),
channel-disjoint dynamic-update-slices +51.4 ms, single-pass 256-wide
`where` +4.2 ms — against a ~1.4 ms byte-count roofline.  This kernel
reads (g, win) once and writes the (B, H+1, W+1, 4C) cotangent once.

Layout contract: the train graph keeps these NHWC tensors in XLA:TPU's
preferred {3,0,2,1:T(8,128)} layout — physical order [H][W][B][C] with
(B, C) as the tiled pair.  Pallas operands must be row-major, so the
wrapper runs the kernel on (H, W, B, C)-transposed views: a row-major
(H, W, B, C) array has the *same physical bytes* as {3,0,2,1} (B, H, W,
C), so XLA lowers the transposes as bitcasts, not copies (verify in
hlo_stats: no relayout fusion should appear around the custom call).

Grid: one step per output row y in [0, H]; the y-halo (group py needs
input row y-py) is fed by a VMEM scratch carry — the TPU grid runs
sequentially, so each step reads row min(y, H-1) once from HBM, takes
row y-1 from the single-slot scratch written by the previous step, then
overwrites the slot with its own row (in-kernel ref load/store order
makes the single slot safe; the first step's uninitialized scratch is
masked by the row_ok predicate, which selects 0 regardless of the
garbage operand).  The original formulation fed each input TWICE via
`cur`/`prev` block specs — measured 3.12 ms/step at batch 16 on v5e;
the carry halves the input DMA bytes (g and the u8 winner are both
lane-padded 64->128 by the {3,0,2,1} producer layout, so reads are the
expensive direction).  Scratch is single-slot rather than
parity-double-buffered because scoped VMEM is the binding constraint:
at batch 16 the two-slot variant's 16.95 MB exceeded the 16 MB scoped
limit (Mosaic's own double-buffered in/out pipeline windows take
~13.8 MB).  The x-shift is a static in-kernel concat along the untiled
W axis.  Channel groups are assembled in 2C-wide pairs so both output
stores land on 128-lane-aligned offsets (C = 64 on the real model).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests flip this to run the kernel in interpret mode on CPU (same switch
# convention as the matcher/NMS kernels' `interpret` kwarg, but readable
# from inside the custom-VJP backward which takes no runtime kwargs).
INTERPRET = False


def _kernel(g_cur, w_cur, out, g_scr, w_scr, *, h: int, c: int, row_axis: int):
    """One output row y = program_id(row_axis) of the (H+1, W+1, B, 4C)
    cotangent (row_axis is the LAST grid dim; a batch-block dim may
    precede it — see the wrapper).

    g_cur/w_cur hold input row min(y, H-1) (invalid at y=H); the py=1
    groups read row y-1 from the scratch carry (invalid at y=0).
    """
    i = pl.program_id(row_axis)
    g_c = g_cur[...]
    w_c = w_cur[...]
    halves = []
    for py in range(2):
        if py == 0:
            g, w_raw, row_ok = g_c, w_c, i < h
        else:
            g = g_scr[...]
            w_raw = w_scr[...]
            row_ok = i >= 1
        # Mosaic's VPU has no sub-word vector compare ("Target does not
        # support this comparison" on i8 cmpi) — widen the u8 winner to i32.
        w = w_raw.astype(jnp.int32)
        zcol = jnp.zeros((1, 1) + g.shape[2:], g.dtype)
        shifted = []
        for px in range(2):
            go = py * 2 + px
            contrib = jnp.where((w == go) & row_ok, g, 0).astype(g.dtype)
            # Place at output columns [px, W+px): group px=0 zero-pads the
            # last column, px=1 the first (the XLA twin's spatial pad).
            pieces = [contrib, zcol] if px == 0 else [zcol, contrib]
            shifted.append(jnp.concatenate(pieces, axis=1))
        halves.append(jnp.concatenate(shifted, axis=3))  # (1, W+1, B, 2C)
    out[:, :, :, : 2 * c] = halves[0]
    out[:, :, :, 2 * c :] = halves[1]
    g_scr[...] = g_c
    w_scr[...] = w_c


def phase_pool_bwd_pallas(
    g: jnp.ndarray, win: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """(B, H, W, C) cotangent + u8 winner -> (B, H+1, W+1, 4C) cotangent.

    Bit-identical to the XLA pad+concat assembly in
    `models/vgg.py::_phase_pool_bwd` (parity-tested in interpret mode;
    exact on device).  win values outside 0..3 (255 = relu-clamped)
    contribute zero everywhere, matching the XLA twin.
    """
    if interpret is None:
        interpret = INTERPRET
    b, h, w, c = g.shape
    gt = jnp.transpose(g, (1, 2, 0, 3))  # (H, W, B, C) — bitcast, see above
    wt = jnp.transpose(win, (1, 2, 0, 3))

    # Blocks are (1, W, bblk, C): VMEM scales with the batch block, and
    # the full batch fits only up to 16 (at b=32 the compile OOM'd scoped
    # VMEM: 21.28M > 16M — caught by the r4 b32 train probe).  b <= 16
    # keeps the original single-block 1-D grid (the measured b16 path,
    # bit-identical HLO); larger batches run a (nb, H+1) grid with batch
    # OUTERMOST, so for each block the row sweep is still sequential and
    # the scratch carry stays correct (at each block's y=0 the carry slot
    # holds the previous block's last row, masked by the same row_ok
    # predicate that masks the uninitialized first step).
    if b <= 16:
        bblk = b
    else:
        bblk = max(k for k in range(1, 17) if b % k == 0)
    nb = b // bblk
    if nb == 1:
        grid: tuple = (h + 1,)
        row_axis = 0
        idx = lambda i: (jnp.minimum(i, h - 1), 0, 0, 0)  # noqa: E731
        out_idx = lambda i: (i, 0, 0, 0)  # noqa: E731
    else:
        grid = (nb, h + 1)
        row_axis = 1
        idx = lambda p, i: (jnp.minimum(i, h - 1), 0, p, 0)  # noqa: E731
        out_idx = lambda p, i: (i, 0, p, 0)  # noqa: E731

    in_row = pl.BlockSpec((1, w, bblk, c), idx)
    out_t = pl.pallas_call(
        functools.partial(_kernel, h=h, c=c, row_axis=row_axis),
        grid=grid,
        in_specs=[in_row, in_row],
        out_specs=pl.BlockSpec((1, w + 1, bblk, 4 * c), out_idx),
        out_shape=jax.ShapeDtypeStruct((h + 1, w + 1, b, 4 * c), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, w, bblk, c), g.dtype),
            pltpu.VMEM((1, w, bblk, c), win.dtype),
        ],
        # The VMEM scratch carries row i's contribution into row i+1, so
        # grid steps MUST run sequentially.  'arbitrary' is today's TPU
        # default, but state it explicitly so a future edit (or a megacore
        # target) can't silently parallelize the grid and corrupt the
        # carry (ADVICE r3).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid)
        ),
        interpret=interpret,
    )(gt, wt)
    return jnp.transpose(out_t, (2, 0, 1, 3))
