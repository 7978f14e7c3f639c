"""Pallas odd-even merge sort for the (u32, u16) k-mer key planes.

An attempt to displace the global `lax.sort` in the count hot path
(reference hot path: kmlib radix sort,
/root/reference/src/kmlib/kmsort.h:13-180 and the CX1 Lv2 sort,
src/sorting/base_engine.cpp:318-351). XLA's global comparator sort
runs ~34 full-HBM passes; TPU has no fast random scatter so a radix
reorder is out (see RESULTS "Sort roofline"). The scheme here: sort
VMEM-sized runs with a batched sort, then merge runs pairwise with a
Pallas kernel per level (one sequential HBM pass per level + an
in-VMEM Batcher odd-even merge network).

OUTCOME (measured on the v5e-lite chip, 2^24 x 48-bit keys; see
RESULTS.md "Sort roofline, round-2 closure"): correct and
byte-identical to lax.sort, but NOT faster - 54 ms vs lax.sort's
30.6 ms. Per-component: DMA floor 0.42 ms/level, coarse row-exchange
stages 0.036 ms each, fine lane-level stages (d < 128) 0.135 ms each,
merge-path windowing ~1.7 ms/level. The fine stages' lane-shuffle
cost is the binding constraint for ANY comparator network on this
VPU, and XLA's fused sort already sits within ~1.3x of that bound.
Kept as the measured evidence for that conclusion, with tests; the
production counter stays on lax.sort.

Keys are 48-bit (hi u32, lo u16) with all-ones reserved as the
sentinel (real keys keep the low 4 bits of `lo` zero, CLAUDE.md key
layout), sorted ascending, keys-only (equal keys interchangeable -
callers carry no payload; validity is derived as `key != sentinel`).

Layout conventions: a flat array of n elements lives as an
(n // 128, 128) row-major tile; flat index = r * 128 + c. A bitonic
exchange at distance d < 128 pairs lanes within a row; d >= 128 pairs
rows. Both are expressed as static rolls + selects (no gathers, no
transposes).

Merge-path tiling: output tile t of a level covers merged ranks
[t*T, (t+1)*T) of its pair. The split (how many of those ranks come
from the A run) is found by binary search on device; windows are
DMA'd from 128-aligned row starts and rotated into place with a
log-decomposed dynamic roll (shifts < 128).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SENT_HI = np.uint32(0xFFFFFFFF)
SENT_LO = np.uint32(0xFFFF)


def _flat_iota(rows):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return r * LANES + c


def _partner(x, d):
    """Values of each element's XOR-d partner (d a power of two)."""
    rows = x.shape[0]
    if d < LANES:
        down = jnp.roll(x, -d, axis=1)   # partner for bit-clear lanes
        up = jnp.roll(x, d, axis=1)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        bit_clear = (c & d) == 0
    else:
        dr = d // LANES
        down = jnp.roll(x, -dr, axis=0)
        up = jnp.roll(x, dr, axis=0)
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        bit_clear = (r & dr) == 0
    return jnp.where(bit_clear, down, up), bit_clear


def _stage(hi, lo, d, dir_up):
    """One bitonic exchange at distance d. dir_up: bool array or True."""
    phi, bit_clear = _partner(hi, d)
    plo, _ = _partner(lo, d)
    gt = (hi > phi) | ((hi == phi) & (lo > plo))
    lt = (hi < phi) | ((hi == phi) & (lo < plo))
    # boolean selects spelled as logic ops: Mosaic rejects vector<i1>
    # operands to arith.select
    if dir_up is True:
        want_partner = (bit_clear & gt) | (~bit_clear & lt)
    else:
        asc = (bit_clear & gt) | (~bit_clear & lt)
        desc = (bit_clear & lt) | (~bit_clear & gt)
        want_partner = (dir_up & asc) | (~dir_up & desc)
    hi = jnp.where(want_partner, phi, hi)
    lo = jnp.where(want_partner, plo, lo)
    return hi, lo


def _lex_gt(h1, l1, h2, l2):
    return (h1 > h2) | ((h1 == h2) & (l1 > l2))


def _flat_shift(x, d, left):
    """x_flat[i + d] (left) or x_flat[i - d] (right) for static d < 128,
    rows-flat layout; garbage wraps at the array ends (callers mask)."""
    s = -d if left else d
    r1 = jnp.roll(x, s, axis=1)
    r2 = jnp.roll(r1, -1 if left else 1, axis=0)
    c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    if left:
        return jnp.where(c < LANES - d, r1, r2)
    return jnp.where(c >= d, r1, r2)


def oddeven_merge_block(hi, lo):
    """Ascending Batcher odd-even merge of a flat (rows, 128) block
    whose two halves are each sorted ascending.

    No reversal needed (unlike a bitonic merge). Stage distances
    n/2, n/4, .., 1; the first stage pairs (i, i + n/2); later stages
    pair (i, i + d) for i with bit d set. Stages with d >= 128 are
    pure static slice/stack exchanges on the row axis (no rolls, no
    masks); d < 128 uses lane rolls with a row-carry select.
    """
    rows = hi.shape[0]
    n = rows * LANES

    # first stage: compare the two halves elementwise
    h0, h1 = hi[:rows // 2], hi[rows // 2:]
    l0, l1 = lo[:rows // 2], lo[rows // 2:]
    gt = _lex_gt(h0, l0, h1, l1)
    hi = jnp.concatenate([jnp.where(gt, h1, h0), jnp.where(gt, h0, h1)])
    lo = jnp.concatenate([jnp.where(gt, l1, l0), jnp.where(gt, l0, l1)])

    d = n // 4
    while d >= LANES:
        dr = d // LANES
        a = rows // (2 * dr)
        vh = hi.reshape(a, 2, dr, LANES)
        vl = lo.reshape(a, 2, dr, LANES)
        ah, al = vh[:, 1], vl[:, 1]            # bit-set halves
        bh, bl = vh[1:, 0], vl[1:, 0]          # their +d partners
        gt = _lex_gt(ah[:-1], al[:-1], bh, bl)
        mn_h = jnp.where(gt, bh, ah[:-1])
        mn_l = jnp.where(gt, bl, al[:-1])
        mx_h = jnp.where(gt, ah[:-1], bh)
        mx_l = jnp.where(gt, al[:-1], bl)
        col1_h = jnp.concatenate([mn_h, ah[-1:]], axis=0)
        col1_l = jnp.concatenate([mn_l, al[-1:]], axis=0)
        col0_h = jnp.concatenate([vh[:1, 0], mx_h], axis=0)
        col0_l = jnp.concatenate([vl[:1, 0], mx_l], axis=0)
        hi = jnp.stack([col0_h, col1_h], axis=1).reshape(rows, LANES)
        lo = jnp.stack([col0_l, col1_l], axis=1).reshape(rows, LANES)
        d //= 2

    f = _flat_iota(rows)
    while d >= 1:
        low = ((f & d) != 0) & (f < n - d)
        high = ((f & d) == 0) & (f >= d)
        pe_h = _flat_shift(hi, d, True)
        pe_l = _flat_shift(lo, d, True)
        gt = _lex_gt(hi, lo, pe_h, pe_l)          # valid at low positions
        mn_h = jnp.where(gt, pe_h, hi)
        mn_l = jnp.where(gt, pe_l, lo)
        mx_h = _flat_shift(jnp.where(gt, hi, pe_h), d, False)
        mx_l = _flat_shift(jnp.where(gt, lo, pe_l), d, False)
        hi = jnp.where(low, mn_h, jnp.where(high, mx_h, hi))
        lo = jnp.where(low, mn_l, jnp.where(high, mx_l, lo))
        d //= 2
    return hi, lo


def bitonic_sort_block(hi, lo):
    """Full ascending bitonic sort of a flat (rows, 128) block."""
    n = hi.shape[0] * LANES
    f = _flat_iota(hi.shape[0])
    k = 2
    while k <= n:
        dir_up = True if k == n else (f & k) == 0
        d = k // 2
        while d >= 1:
            hi, lo = _stage(hi, lo, d, dir_up)
            d //= 2
        k *= 2
    return hi, lo


def _flat_roll_left(x, h, max_rows=1):
    """Rows-flat left-rotation by a dynamic scalar h in
    [0, max_rows * 128), decomposed into conditional static sublane
    rolls (row part) plus lane rolls with a row-carry select (no
    gathers).

    x: (rows, 128); returns y with y_flat[i] = x_flat[(i + h) % n].
    """
    hr = h // LANES
    b = 1
    while b < max_rows:
        x = jnp.where((hr & b) != 0, jnp.roll(x, -b, axis=0), x)
        b *= 2
    hc = h - hr * LANES
    r = x
    for b in (64, 32, 16, 8, 4, 2, 1):
        r = jnp.where((hc & b) != 0, jnp.roll(r, -b, axis=1), r)
    # r[row, c] == x[row, (c + hc) % 128]; lanes that wrapped must come
    # from the next row
    nxt = jnp.roll(r, -1, axis=0)
    c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(c < LANES - hc, r, nxt)


# ---------------------------------------------------------------------------
# Whole-pair merge kernel (tile == one pair of runs; fully aligned)
# ---------------------------------------------------------------------------


def _merge_pair_kernel(a_hi, a_lo, b_hi, b_lo, o_hi, o_lo):
    # lo rides as u16 in HBM but is widened for compute: the VPU has no
    # unsigned 16-bit compare
    hi = jnp.concatenate([a_hi[:], b_hi[:]], axis=0)
    lo = jnp.concatenate([a_lo[:].astype(jnp.uint32),
                          b_lo[:].astype(jnp.uint32)], axis=0)
    hi, lo = oddeven_merge_block(hi, lo)
    o_hi[:] = hi
    o_lo[:] = lo.astype(jnp.uint16)


def _merge_level_aligned(hi, lo, run_len, interpret=False):
    """One merge level where every tile is a whole pair (2*run_len)."""
    n = hi.shape[0]
    rr = run_len // LANES
    h2 = hi.reshape(n // LANES, LANES)
    l2 = lo.reshape(n // LANES, LANES)
    n_pairs = n // (2 * run_len)
    spec_a = pl.BlockSpec((rr, LANES), lambda t: (2 * t, 0))
    spec_b = pl.BlockSpec((rr, LANES), lambda t: (2 * t + 1, 0))
    spec_o = pl.BlockSpec((2 * rr, LANES), lambda t: (t, 0))
    oh, ol = pl.pallas_call(
        _merge_pair_kernel,
        grid=(n_pairs,),
        in_specs=[spec_a, spec_a, spec_b, spec_b],
        out_specs=[spec_o, spec_o],
        out_shape=[
            jax.ShapeDtypeStruct(h2.shape, jnp.uint32),
            jax.ShapeDtypeStruct(l2.shape, jnp.uint16),
        ],
        interpret=interpret,
    )(h2, l2, h2, l2)
    return oh.reshape(n), ol.reshape(n)


# ---------------------------------------------------------------------------
# Merge-path level kernel (runs longer than the tile)
# ---------------------------------------------------------------------------


def _merge_path_splits(hi, lo, run_len, tile, n):
    """Per output tile: the A-run range [a_from, a_to) that feeds it.

    A-priority on ties: among the first q merged elements of a pair,
    the A count is the largest a with a == max(0, q-L) or
    A[a-1] <= B[q-a].
    """
    n_tiles = n // tile
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    pair_start = (t * tile) // (2 * run_len) * (2 * run_len)
    a_base = pair_start
    b_base = pair_start + run_len

    def le(h1, l1, h2, l2):
        return (h1 < h2) | ((h1 == h2) & (l1 <= l2))

    def split(q):
        lo_a = jnp.maximum(0, q - run_len)
        hi_a = jnp.minimum(q, run_len)

        def body(_, carry):
            lo_b, hi_b = carry
            a = (lo_b + hi_b + 1) // 2
            ai = jnp.clip(a_base + a - 1, 0, n - 1)
            bi = jnp.clip(b_base + q - a, 0, n - 1)
            ok = le(hi[ai], lo[ai], hi[bi], lo[bi])
            ok = ok & (lo_b < hi_b)  # no-op once converged
            new_lo = jnp.where(ok, a, lo_b)
            new_hi = jnp.where(ok, hi_b, jnp.where(lo_b < hi_b, a - 1, hi_b))
            return new_lo, new_hi

        iters = int(np.ceil(np.log2(max(run_len, 2)))) + 2
        lo_a, hi_a = jax.lax.fori_loop(0, iters, body, (lo_a, hi_a))
        return lo_a

    q_lo = t * tile - pair_start
    a_from = split(q_lo)
    a_to = split(q_lo + tile)
    return a_from, a_to, pair_start, q_lo


ALIGN_ROWS = 16  # DMA row starts/shapes must honor the (8/16,128) tiling


def _make_path_kernel(tile):
    tr = tile // LANES
    wr = tr + ALIGN_ROWS  # window rows: tile + alignment slack

    def kernel(as_ref, ae_ref, bs_ref, be_ref,
               hi_hbm, lo_hbm, o_hi, o_lo,
               a_hi_s, a_lo_s, b_hi_s, b_lo_s, sems):
        t = pl.program_id(0)
        n_t = pl.num_programs(0)

        def dmas(slot, tt):
            a_row = as_ref[tt] // (LANES * ALIGN_ROWS) * ALIGN_ROWS
            b_row = bs_ref[tt] // (LANES * ALIGN_ROWS) * ALIGN_ROWS
            return (
                pltpu.make_async_copy(hi_hbm.at[pl.ds(a_row, wr), :],
                                      a_hi_s.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(lo_hbm.at[pl.ds(a_row, wr), :],
                                      a_lo_s.at[slot], sems.at[slot, 1]),
                pltpu.make_async_copy(hi_hbm.at[pl.ds(b_row, wr), :],
                                      b_hi_s.at[slot], sems.at[slot, 2]),
                pltpu.make_async_copy(lo_hbm.at[pl.ds(b_row, wr), :],
                                      b_lo_s.at[slot], sems.at[slot, 3]),
            )

        slot = jax.lax.rem(t, 2)

        @pl.when(t == 0)
        def _():
            for d in dmas(0, 0):
                d.start()

        @pl.when(t + 1 < n_t)
        def _():
            for d in dmas(1 - slot, t + 1):
                d.start()

        for d in dmas(slot, t):
            d.wait()

        a_start = as_ref[t]
        b_start = bs_ref[t]
        span = LANES * ALIGN_ROWS
        ha = a_start - (a_start // span) * span
        hb = b_start - (b_start // span) * span

        def window(hi_s, lo_s, h, count):
            whi = hi_s[slot]
            wlo = lo_s[slot].astype(jnp.uint32)
            whi = _flat_roll_left(whi, h, ALIGN_ROWS)[:tr]
            wlo = _flat_roll_left(wlo, h, ALIGN_ROWS)[:tr]
            live = _flat_iota(tr) < count
            whi = jnp.where(live, whi, jnp.uint32(0xFFFFFFFF))
            wlo = jnp.where(live, wlo, jnp.uint32(0xFFFF))
            return whi, wlo

        a_h, a_l = window(a_hi_s, a_lo_s, ha, ae_ref[t] - a_start)
        b_h, b_l = window(b_hi_s, b_lo_s, hb, be_ref[t] - b_start)
        hi = jnp.concatenate([a_h, b_h], axis=0)
        lo = jnp.concatenate([a_l, b_l], axis=0)
        hi, lo = oddeven_merge_block(hi, lo)
        o_hi[:] = hi[:tr]
        o_lo[:] = lo[:tr].astype(jnp.uint16)

    return kernel, wr


def _merge_level_path(hi, lo, run_len, tile, interpret=False):
    """One merge level with tiles smaller than the runs (merge-path)."""
    n = hi.shape[0]
    n_tiles = n // tile
    a_from, a_to, pair_start, q_lo = _merge_path_splits(
        hi, lo, run_len, tile, n)
    a_abs_s = pair_start + a_from
    a_abs_e = pair_start + a_to
    b_abs_s = pair_start + run_len + (q_lo - a_from)
    b_abs_e = pair_start + run_len + (q_lo + tile - a_to)

    tr = tile // LANES
    kernel, wr = _make_path_kernel(tile)
    # pad one window of rows so end-of-array DMAs stay in bounds
    pad = wr * LANES
    h2 = jnp.concatenate([hi, jnp.full(pad, SENT_HI, jnp.uint32)])
    l2 = jnp.concatenate([lo, jnp.full(pad, np.uint16(SENT_LO), jnp.uint16)])
    h2 = h2.reshape(-1, LANES)
    l2 = l2.reshape(-1, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tr, LANES), lambda t, *_: (t, 0)),
            pl.BlockSpec((tr, LANES), lambda t, *_: (t, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, wr, LANES), jnp.uint32),
            pltpu.VMEM((2, wr, LANES), jnp.uint16),
            pltpu.VMEM((2, wr, LANES), jnp.uint32),
            pltpu.VMEM((2, wr, LANES), jnp.uint16),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    oh, ol = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.uint16),
        ],
        interpret=interpret,
    )(a_abs_s, a_abs_e, b_abs_s, b_abs_e, h2, l2)
    return oh.reshape(n), ol.reshape(n)


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

INIT_RUN = 8192     # initial batched-sort row length
MAX_TILE = 65536    # merge tile cap (VMEM-bound)


def sort_planes(hi, lo, init_run=INIT_RUN, max_tile=MAX_TILE,
                interpret=False):
    """Ascending keys-only sort of 48-bit (u32, u16) planes.

    Requires len(hi) a power of two and >= 2*init_run; callers pad
    with the all-ones sentinel (which sorts to the tail). Falls back
    to lax.sort when the shape doesn't fit the network.
    """
    n = hi.shape[0]
    if n < 2 * init_run or (n & (n - 1)) != 0:
        return jax.lax.sort((hi, lo), num_keys=2, is_stable=False)
    rows = n // init_run
    oh, ol = jax.lax.sort(
        (hi.reshape(rows, init_run), lo.reshape(rows, init_run)),
        num_keys=2, is_stable=False, dimension=1)
    hi, lo = oh.reshape(n), ol.reshape(n)
    run = init_run
    while run < n:
        if 2 * run <= max_tile:
            hi, lo = _merge_level_aligned(hi, lo, run, interpret=interpret)
        else:
            hi, lo = _merge_level_path(hi, lo, run, max_tile,
                                       interpret=interpret)
        run *= 2
    return hi, lo
