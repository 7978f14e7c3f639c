"""Memory-bounded (out-of-core) SdBG construction.

TPU-native re-expression of the reference CX1 engine's defining
capability: building graphs LARGER than memory by streaming prefix
buckets through a fixed budget (reference AdjustMemory + the
Lv1-bucket-round loop, src/sorting/base_engine.cpp:14-141,176-281, and
the bucket-sharded output files merged via metadata,
src/sequence/io/edge/edge_io_meta.h:24-45).

Design:
  * ONE streaming pass extracts window rows (key words + multiplicity
    word) chunk-by-chunk and partitions them into 256 spill files by
    the top 8 bits of the key (order-preserving prefix buckets; the
    census is a byproduct of spill sizes - reference Lv0CalcBucketSize).
  * Rounds = runs of consecutive buckets whose total row count fits the
    budget (reference Lv1FindEndBuckets). Keys equal each other only
    within one bucket, so rounds never split a key group: no boundary
    exchange is ever needed.
  * Pass 2 sorts each round - per-bucket batched device sorts over the
    16-bit-prefix grouping (or the mesh-sharded sample sorter), dedups
    with max/sum multiplicity (the mult word is the LAST sort word),
    and appends the round's edges; rounds are in prefix order, so the
    concatenation is the globally sorted edge set. Navigation
    (run_start/nxt_link/rc) derives lazily from that sorted set inside
    Sdbg (graph/sdbg.py _nav_links) - no node/rc join passes exist.

Working-set memory is bounded by the round budget; the full window
multiset only ever exists on disk (like the reference's edge files).
The spill pass is double-buffered (host partition+write overlaps the
next chunk's extraction) and round reads prefetch under the sorts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..core import kmerops
from ..utils.log import get_logger
from .counter import KMAX_MUL, _pow2_pad, pack_flat, window_valid_mask
from .sdbg import NULL, Sdbg

N_BUCKETS = 256  # spill files: top 8 bits of word0 = first 4 bases
N_SUB = 256      # logical sub-buckets per file: next 8 bits (16-bit
                 # prefix total - the reference's 65,536-bucket
                 # granularity, base_engine.h:19-21)


# ---------------------------------------------------------------------------
# host aliases of the dual-backend key ops (kmerops helpers are
# polymorphic: numpy in -> numpy out; kept as names so call sites read
# as the host-side bookkeeping they are)
# ---------------------------------------------------------------------------


def _as_np(a):
    return np.ascontiguousarray(np.asarray(a))


def np_mask_tail(keys: np.ndarray, k: int) -> np.ndarray:
    return _as_np(kmerops.mask_tail(keys, k))


def np_shift_left_bits(keys: np.ndarray, nbits: int) -> np.ndarray:
    return _as_np(kmerops.shift_left_bits(keys, nbits))


def np_revcomp(keys: np.ndarray, k: int) -> np.ndarray:
    return _as_np(kmerops.revcomp_kmers(keys, k))


def np_drop_first_base(keys: np.ndarray, k: int) -> np.ndarray:
    return _as_np(kmerops.drop_first_base(keys, k))


def np_get_base(keys: np.ndarray, i: int) -> np.ndarray:
    return _as_np(kmerops.get_base(keys, i))


# ---------------------------------------------------------------------------
# spill files
# ---------------------------------------------------------------------------


class SpillSet:
    """256 append-only raw files of fixed-width uint32 rows, bucketed by
    the top 8 bits of each row's first word (the analogue of the
    reference's per-thread bucket-sharded files, sdbg_writer.h:19-63).

    Rows inside each appended chunk are additionally grouped by the
    full 16-bit prefix (the reference's 65,536-bucket granularity) and
    the per-append sub-censuses are kept, so `read_range_grouped` can
    return a round's rows grouped by fine bucket - the layout the
    batched per-bucket device sort needs (see _sort_rows_grouped)."""

    def __init__(self, dir_: str, name: str, row_words: int):
        os.makedirs(dir_, exist_ok=True)
        self.paths = [
            os.path.join(dir_, f"{name}.{b:03d}.bin")
            for b in range(N_BUCKETS)
        ]
        self.row_words = row_words
        self.counts = np.zeros(N_BUCKETS, dtype=np.int64)
        # per file: list of (N_SUB,) uint32 sub-censuses, one per append
        self.sub_counts: list[list[np.ndarray]] = [
            [] for _ in range(N_BUCKETS)
        ]
        for p in self.paths:
            if os.path.exists(p):
                os.remove(p)
        # persistent append handles: reopening 256 files per append
        # costs more than the writes at high batch counts
        self._fhs: dict[int, object] = {}

    def _fh(self, i: int):
        fh = self._fhs.get(i)
        if fh is None:
            fh = open(self.paths[i], "ab")
            self._fhs[i] = fh
        return fh

    def _close_fhs(self) -> None:
        for fh in self._fhs.values():
            fh.close()
        self._fhs.clear()

    def append(self, rows: np.ndarray) -> None:
        """rows: (N, row_words) uint32; bucketed by rows[:,0] >> 16."""
        if not len(rows):
            return
        b16 = (rows[:, 0] >> np.uint32(16)).astype(np.uint16)
        order = np.argsort(b16, kind="stable")  # numpy radix on u16
        rows = rows[order]
        sizes16 = np.bincount(
            b16, minlength=N_BUCKETS * N_SUB
        ).astype(np.int64).reshape(N_BUCKETS, N_SUB)
        sizes = sizes16.sum(axis=1)
        self.counts += sizes
        offs = np.zeros(N_BUCKETS + 1, dtype=np.int64)
        np.cumsum(sizes, out=offs[1:])
        for i in np.nonzero(sizes)[0]:
            self._fh(i).write(rows[offs[i]:offs[i + 1]].tobytes())
            self.sub_counts[i].append(sizes16[i].astype(np.uint32))

    def read_range(self, lo: int, hi: int) -> np.ndarray:
        """All rows of buckets [lo, hi) (file append order)."""
        self._close_fhs()  # flush buffered appends before any read
        parts = []
        for i in range(lo, hi):
            if self.counts[i] == 0:
                continue
            parts.append(
                np.fromfile(self.paths[i], dtype=np.uint32)
                .reshape(-1, self.row_words)
            )
        if not parts:
            return np.zeros((0, self.row_words), np.uint32)
        return np.concatenate(parts, axis=0)

    def read_range_grouped(self, lo: int, hi: int
                           ) -> tuple[np.ndarray, np.ndarray]:
        """Rows of buckets [lo, hi) grouped by 16-bit prefix bucket.

        Returns (rows, bucket_counts) where bucket_counts has
        (hi-lo)*N_SUB entries in prefix order and rows are contiguous
        per fine bucket. Grouping a file is a stable radix argsort of
        the reconstructed per-row sub-bucket ids (each append is
        already sub-grouped, so ids come from np.repeat of the stored
        censuses, not from the data)."""
        self._close_fhs()  # flush buffered appends before any read
        parts = []
        gcounts = np.zeros((hi - lo) * N_SUB, dtype=np.int64)
        sub_ids = np.arange(N_SUB, dtype=np.uint16)
        for i in range(lo, hi):
            if self.counts[i] == 0:
                continue
            data = np.fromfile(
                self.paths[i], dtype=np.uint32
            ).reshape(-1, self.row_words)
            subs = np.stack(self.sub_counts[i])  # (A, N_SUB)
            gcounts[(i - lo) * N_SUB:(i - lo + 1) * N_SUB] = subs.sum(0)
            if subs.shape[0] > 1:
                key = np.repeat(
                    np.tile(sub_ids, subs.shape[0]), subs.reshape(-1)
                )
                data = data[np.argsort(key, kind="stable")]
            parts.append(data)
        if not parts:
            return np.zeros((0, self.row_words), np.uint32), gcounts
        return np.concatenate(parts, axis=0), gcounts

    def cleanup(self) -> None:
        self._close_fhs()
        for p in self.paths:
            if os.path.exists(p):
                os.remove(p)


# Performance cap on rows per round, independent of the -m budget: a
# single giant round defeats the spill-read prefetch overlap and
# pushes the sort working set past cache/RAM comfort (measured on the
# 4-core host: 72M rows in 1 round = 112 s vs 2 rounds = 53 s; the
# 336M-row community round thrashed at 44 GB RSS). The budget remains
# the hard memory bound; this only splits finer when allowed.
_ROUND_CAP_ROWS = int(os.environ.get(
    "MEGAHIT_TPU_ROUND_CAP_ROWS", 1 << 26))


def plan_rounds(counts: np.ndarray, budget_rows: int) -> list[tuple[int, int]]:
    """Greedy contiguous bucket ranges with total rows <= budget
    (reference Lv1FindEndBuckets, base_engine.cpp:254-281). A single
    bucket larger than the budget becomes its own (oversized) round."""
    log = get_logger()
    budget_rows = min(budget_rows, max(_ROUND_CAP_ROWS, 1 << 14))
    rounds = []
    lo = 0
    while lo < N_BUCKETS:
        hi = lo + 1
        total = int(counts[lo])
        if total > budget_rows:
            log.warning(
                "bucket %d has %d rows > budget %d; processing oversized",
                lo, total, budget_rows,
            )
        while hi < N_BUCKETS and total + int(counts[hi]) <= budget_rows:
            total += int(counts[hi])
            hi += 1
        rounds.append((lo, hi))
        lo = hi
    return rounds


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


@dataclass
class PoolSource:
    """A packed sequence pool: every k-window of every sequence, both
    strands, carrying its sequence's multiplicity. flat_codes may be
    raw u8 codes or a PackedPool (streamed in bounded windows)."""

    flat_codes: np.ndarray
    starts: np.ndarray
    mults: np.ndarray  # (S,) int32 per-sequence


@dataclass
class EdgeSource:
    """Canonical edges + counts (counter/mercy/iterate outputs); the rc
    strand is implied."""

    keys: np.ndarray
    counts: np.ndarray


def _spill_pool(spill: SpillSet, src: PoolSource, k: int,
                batch_windows: int, unit: bool = False) -> int:
    """Stream-extract all window rows of a pool into the spill set.
    FULLY windowed: only one chunk of packed words / validity / mults
    is ever resident, so the pass handles pools larger than RAM
    (reference AsyncSequenceReader batches, async_sequence_reader.h).
    Returns total rows spilled."""
    from .counter import as_pool, window_valid_range

    w = kmerops.words_per_kmer(k)
    n_bases = int(src.starts[-1])
    if n_bases < k:
        return 0
    from concurrent.futures import ThreadPoolExecutor

    pool = as_pool(src.flat_codes)
    mults = np.asarray(src.mults, dtype=np.int32)
    total_words = pool.n_words + w + 1
    n_dense = (total_words - w) * 16
    chunk = max(1 << 16, (batch_windows + 15) & ~15)
    total = 0
    # double-buffered: the host partition+write of chunk i overlaps
    # the extraction of chunk i+1 (the reference's pipeline
    # parallelism between reader and Lv0/Lv1 scans); SpillSet state is
    # touched only by the single writer thread during the loop
    pending = None
    with ThreadPoolExecutor(max_workers=1) as ex:
        for lo in range(0, n_bases, chunk):
            hi = min(n_dense, lo + chunk)
            lo_w = lo // 16
            size = min((hi + 15) // 16 + w + 1, total_words) - lo_w
            sub = jnp.asarray(pool.window_padded(lo_w, size))
            fwd = np.asarray(kmerops.extract_all_kmers(sub, k))
            span = min(min(hi, n_bases) - lo, fwd.shape[0])
            vm = window_valid_range(src.starts, k, lo, lo + span)
            fwd_c = fwd[:span][vm]
            rc_c = np_revcomp(fwd_c, k)
            if unit:
                # every window contributes multiplicity 1: no mult
                # word is spilled (dedup counts group sizes instead)
                rows = np.empty((2 * len(fwd_c), w), np.uint32)
                rows[: len(fwd_c)] = fwd_c
                rows[len(fwd_c):] = rc_c
            else:
                posv = np.flatnonzero(vm) + lo
                si = np.searchsorted(src.starts, posv,
                                     side="right") - 1
                mm = mults[si].astype(np.uint32)
                rows = np.empty((2 * len(fwd_c), w + 1), np.uint32)
                rows[: len(fwd_c), :w] = fwd_c
                rows[len(fwd_c):, :w] = rc_c
                rows[: len(fwd_c), w] = mm
                rows[len(fwd_c):, w] = mm
            if pending is not None:
                pending.result()
            pending = ex.submit(spill.append, rows)
            total += len(rows)
            if hi >= n_dense:
                break
        if pending is not None:
            pending.result()
    return total


def _spill_edges(spill: SpillSet, src: EdgeSource, k: int) -> int:
    keys = np.asarray(src.keys, dtype=np.uint32)
    if not len(keys):
        return 0
    counts = np.asarray(src.counts, dtype=np.uint32)
    w = keys.shape[1]
    rc = np_revcomp(keys, k)
    rows = np.empty((2 * len(keys), w + 1), np.uint32)
    rows[: len(keys), :w] = keys
    rows[len(keys):, :w] = rc
    rows[: len(keys), w] = counts
    rows[len(keys):, w] = counts
    spill.append(rows)
    return len(rows)


# ---------------------------------------------------------------------------
# device sort wrapper (single device or mesh-sharded)
# ---------------------------------------------------------------------------


def _sort_rows(rows: np.ndarray, mesh=None) -> np.ndarray:
    """Sort (N, C) uint32 rows lexicographically on device; returns the
    first N rows of the sorted result (pow2 sentinel padding sorts
    strictly to the tail: real rows always have some word < 0xFFFFFFFF
    - the mult/aux word is bounded - so real < sentinel)."""
    n, c = rows.shape
    if n == 0:
        return rows
    if mesh is not None:
        from ..parallel.shuffle import sharded_sort_kmers

        out = sharded_sort_kmers(rows, mesh)
        assert len(out) == n, (len(out), n)
        return out
    npad = _pow2_pad(n)
    if npad > n:
        rows = np.concatenate(
            [rows, np.full((npad - n, c), 0xFFFFFFFF, np.uint32)], axis=0
        )
    (srows,) = kmerops.sort_keys_with_payload(jnp.asarray(rows))
    return np.asarray(srows)[:n]


def _use_bucket_sort(mesh) -> bool:
    import jax

    mode = os.environ.get("MEGAHIT_TPU_BUCKET_SORT", "auto")
    if mode == "never" or mesh is not None:
        return False
    if mode == "force":
        return True
    # the batched form wins only on the accelerator; the host fast
    # path (numpy lexsort) doesn't benefit from run decomposition
    return jax.default_backend() not in ("cpu",)


# minimum batched run length; the real run length is driven by the
# largest bucket (run_len = max(_MIN_RUN, pow2ceil(max_bucket))).
# Shorter runs keep winning on the chip - measured round 4 on the
# v5e-lite at 16.7M x (u32,u16): 4096-row runs 7.26 ms, 1024-row
# 3.96 ms, 256-row 2.08 ms - so the floor sits just above the average
# bucket occupancy (16.7M rows / 65,536 buckets = 256) where packing
# gaps stay small
_MIN_RUN = 512


def _extract_bits8(word_col: np.ndarray, bit_off: int) -> np.ndarray:
    """Bits [bit_off, bit_off+8) of each row's bitstream, given the
    column holding them (bit_off % 32 is always a multiple of 8 here,
    so the byte never straddles words)."""
    sh = 24 - (bit_off % 32)
    return ((word_col >> np.uint32(sh)) & np.uint32(0xFF)).astype(
        np.int64)


def _refine_grouped(rows: np.ndarray, counts: np.ndarray, target: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Split groups with > target rows by successive 8-bit extensions
    of the row prefix - the sub-16-bit analogue of the reference's
    re-splitting of oversized buckets (base_engine.cpp:231-281) - so
    the batched sort's run length stays at the bench shape instead of
    being dictated by the largest 16-bit bucket.

    Refinement may use ANY row bits (including the trailing mult/aux
    word): groups stay in row-prefix order and rows in different
    groups compare by that prefix, so per-group sorts still
    concatenate to the global lexicographic order. Groups still over
    target after ALL 32*C bits are runs of IDENTICAL rows - already
    sorted by definition; the caller splices them past the device
    sort. Permutes `rows` in place (callers treat the input as
    consumed); returns (rows, refined_counts)."""
    c = rows.shape[1]
    counts = counts[counts > 0].astype(np.int64)
    bit_off = 16
    max_bits = 32 * c
    while int(counts.max(initial=0)) > target and bit_off < max_bits:
        big = np.flatnonzero(counts > target)
        starts = np.cumsum(counts) - counts
        seg = counts[big]
        idx = np.repeat(starts[big], seg) + _concat_aranges(seg)
        sub = _extract_bits8(rows[idx, bit_off // 32], bit_off)
        comp = np.repeat(
            np.arange(len(big), dtype=np.int64) * 256, seg) + sub
        perm = np.argsort(comp, kind="stable")  # radix on ints
        rows[idx] = rows[idx][perm]
        subcounts = np.bincount(
            comp, minlength=len(big) * 256).reshape(len(big), 256)
        pieces, prev = [], 0
        for bi, b in enumerate(big):
            if b > prev:
                pieces.append(counts[prev:b])
            pieces.append(subcounts[bi])
            prev = int(b) + 1
        if prev < len(counts):
            pieces.append(counts[prev:])
        counts = np.concatenate(pieces)
        counts = counts[counts > 0]
        bit_off += 8
    return rows, counts


def _sort_rows_grouped(rows: np.ndarray, bcounts: np.ndarray,
                       mesh=None) -> np.ndarray:
    """Sort rows that arrive GROUPED by prefix bucket (contiguous
    segments in prefix order, sizes `bcounts`): per-bucket batched
    device sorts preserve global lexicographic order with no merge,
    because keys in different prefix buckets never compare equal and
    buckets are in prefix order (the reference exploits the same
    partitioning: 65,536-bucket Lv2 sorts, base_engine.h:19-21).

    Buckets larger than _MIN_RUN are refined by prefix extension
    (_refine_grouped) so production rounds sort at the _MIN_RUN run
    shape - the shape bench.py measures - regardless of bucket skew;
    identical-row mega-groups bypass the sort entirely.

    Whole buckets are packed greedily into equal-length runs (a run =
    one row of the batched lax.sort); runs are sentinel-padded at the
    tail. Measured on one v5e-lite at 16.7M x (u32,u16): global 1-D
    lax.sort 30.8 ms vs batched runs 16.2 ms (64K rows/run) - 6.6 ms
    (4K rows/run) - 2.6 ms (512-row runs). May permute `rows` in
    place (callers treat the input as consumed)."""
    import jax

    n, c = rows.shape
    if n == 0:
        return rows
    if not _use_bucket_sort(mesh):
        return _sort_rows(rows, mesh)
    bc = bcounts[bcounts > 0].astype(np.int64)
    if int(bc.max()) > _MIN_RUN:
        rows, bc = _refine_grouped(rows, bc, _MIN_RUN)
    pre = bc > _MIN_RUN  # only identical-row groups can remain big
    if pre.any():
        starts = np.cumsum(bc) - bc
        pre_idx = np.repeat(starts[pre], bc[pre]) + _concat_aranges(
            bc[pre])
        norm_mask = np.ones(n, dtype=bool)
        norm_mask[pre_idx] = False
        out = np.empty_like(rows)
        out[pre_idx] = rows[pre_idx]  # identical rows: sorted as-is
        sub = _sort_rows_grouped(
            np.ascontiguousarray(rows[norm_mask]), bc[~pre], mesh)
        out[norm_mask] = sub
        get_logger().info(
            "round sort: %d identical-row rows bypassed the sort "
            "(%d groups)", len(pre_idx), int(pre.sum()))
        return out
    mx = int(bc.max())
    run_len = max(_MIN_RUN, 1 << int(np.ceil(np.log2(mx))))
    if run_len >= n:
        return _sort_rows(rows, mesh)

    # greedy pack contiguous buckets into runs of capacity run_len
    run_id = np.empty(len(bc), dtype=np.int64)
    rid, acc = 0, 0
    for i, cnt in enumerate(bc):
        if acc + cnt > run_len:
            rid, acc = rid + 1, 0
        run_id[i] = rid
        acc += int(cnt)
    n_runs = rid + 1
    get_logger().info(
        "round sort shape: %d rows, run_len %d x %d runs "
        "(max group %d)", n, run_len, n_runs, mx)
    run_fill = np.bincount(run_id, weights=bc,
                           minlength=n_runs).astype(np.int64)

    # destination offset of each bucket inside the padded (R, L) grid
    within = np.cumsum(bc) - bc  # global prefix
    run_base_src = np.zeros(n_runs, dtype=np.int64)
    first_of_run = np.ones(len(bc), dtype=bool)
    first_of_run[1:] = run_id[1:] != run_id[:-1]
    run_base_src[run_id[first_of_run]] = within[first_of_run]
    dst_start = run_id * run_len + (within - run_base_src[run_id])

    # one scatter moves all rows; only the pad gaps get sentinels
    padded = np.empty((n_runs * run_len, c), dtype=np.uint32)
    dst_rows = np.repeat(dst_start - within, bc) + np.arange(
        n, dtype=np.int64
    )
    padded[dst_rows] = rows
    gap_counts = run_len - run_fill
    gap_rows = np.repeat(
        np.arange(n_runs, dtype=np.int64) * run_len + run_fill,
        gap_counts,
    ) + _concat_aranges(gap_counts)
    padded[gap_rows] = 0xFFFFFFFF

    ops = tuple(
        jnp.asarray(np.ascontiguousarray(padded[:, i]).reshape(
            n_runs, run_len))
        for i in range(c)
    )
    out = jax.lax.sort(ops, num_keys=c, is_stable=False, dimension=1)
    res = np.stack([np.asarray(o).reshape(-1) for o in out], axis=1)
    keep = np.ones(n_runs * run_len, dtype=bool)
    keep[gap_rows] = False
    return res[keep]


def _concat_aranges(counts: np.ndarray) -> np.ndarray:
    """[arange(c) for c in counts], concatenated, vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _halve_palindromes(edges: np.ndarray, sums: np.ndarray, k: int
                       ) -> np.ndarray:
    """Palindromic keys (possible: the edge length k is even) received
    BOTH strand rows of each window into ONE group, so their window
    count arrived doubled; the reference counter counts each canonical
    window once (kmer_counter.cpp:137-144). Cheap prefilter: a
    palindrome's first base must complement its last. Mutates and
    returns sums."""
    first_b = edges[:, 0] >> np.uint32(30)
    lw, sh = (k - 1) >> 4, 30 - 2 * ((k - 1) & 15)
    last_b = (edges[:, lw] >> np.uint32(sh)) & np.uint32(3)
    cand = np.flatnonzero(first_b == np.uint32(3) - last_b)
    if len(cand):
        rcc = np_revcomp(edges[cand], k)
        pal = cand[(rcc == edges[cand]).all(axis=1)]
        sums[pal] >>= 1
    return sums


def _fine_bucket_counts(sorted_word0: np.ndarray, lo: int, hi: int
                        ) -> np.ndarray:
    """Per-16-bit-prefix-bucket counts of an ALREADY sorted array
    (buckets [lo, hi) at file granularity)."""
    needles = (np.arange(lo * N_SUB, hi * N_SUB, dtype=np.uint32)
               << np.uint32(16))
    starts = np.searchsorted(sorted_word0, needles)
    ends = np.concatenate([starts[1:], [len(sorted_word0)]])
    return (ends - starts).astype(np.int64)


def _merge_grouped(a: np.ndarray, ac: np.ndarray,
                   b: np.ndarray, bc: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Merge two bucket-grouped row arrays into one grouped array
    (rows of the same bucket become contiguous; intra-bucket order is
    irrelevant - every consumer sorts)."""
    counts = ac + bc
    out = np.empty((len(a) + len(b), a.shape[1]), dtype=a.dtype)
    dst_base = np.cumsum(counts) - counts
    a_src = np.cumsum(ac) - ac
    b_src = np.cumsum(bc) - bc
    na = len(a)
    dst_a = np.repeat(dst_base - a_src, ac) + np.arange(
        na, dtype=np.int64)
    dst_b = np.repeat(dst_base + ac - b_src, bc) + np.arange(
        len(b), dtype=np.int64)
    out[dst_a] = a
    out[dst_b] = b
    return out, counts


# ---------------------------------------------------------------------------
# the builder
# ---------------------------------------------------------------------------


@dataclass
class BuildStats:
    n_rounds: int = 0
    max_round_rows: int = 0
    total_spilled_rows: int = 0
    n_edges: int = 0
    round_ranges: list = field(default_factory=list)


def build_sdbg_bucketed(
    sources: list,
    k: int,
    budget_rows: int,
    spill_dir: str,
    mesh=None,
    batch_windows: int = 1 << 21,
    stats: BuildStats | None = None,
    mult_mode: str = "max",
    min_count: int = 1,
    shard_dir: str | None = None,
) -> Sdbg:
    """Build the SdBG from any mix of PoolSource/EdgeSource inputs with
    a bounded in-memory working set (<= ~budget_rows rows per device
    sort). The multiset itself lives on disk.

    mult_mode:
      "max"   - dedup keeps the maximum contribution (seq2sdbg
                semantics, seq_to_sdbg.cpp:640-643); identical to
                sdbg._finalize_sdbg over the union multiset (tested).
      "count" - dedup SUMS contributions and drops groups below
                min_count: the 1-pass read2sdbg semantics
                (read_to_sdbg_s1.cpp solidity counting) - the
                both-strand group size of edge e equals
                occ(e) + occ(rc(e)), i.e. the canonical k-mer count,
                so counts match the 2-pass counter exactly.

    shard_dir: when set, each round's edges ALSO stream to a
    ShardedSdbgWriter there (per-shard files + bucket manifest,
    reference sdbg_writer.h:19-63) - rounds are bucket ranges in
    prefix order, so the shard layout falls straight out of the
    build; no post-hoc re-save of the whole graph is needed.
    """
    log = get_logger()
    w = kmerops.words_per_kmer(k)
    st = stats if stats is not None else BuildStats()

    # unit-multiplicity fast path: every contribution is 1 (read
    # windows in count mode), so the mult word is never spilled -
    # 1/(w+1) less spill I/O and one less sort word; dedup counts
    # group sizes instead. Requires k % 16 != 0 so real keys always
    # have zero pad bits in the last word and sort strictly below the
    # all-ones sentinel rows.
    unit = (
        mult_mode == "count"
        and k % 16 != 0
        and all(isinstance(s, PoolSource)
                and bool(np.all(np.asarray(s.mults) == 1))
                for s in sources)
    )
    row_words = w if unit else w + 1

    # ---- pass 1: spill the window multiset, bucketed by key prefix
    spill = SpillSet(spill_dir, "edges", row_words)
    total = 0
    for src in sources:
        if isinstance(src, PoolSource):
            total += _spill_pool(spill, src, k, batch_windows,
                                 unit=unit)
        elif isinstance(src, EdgeSource):
            total += _spill_edges(spill, src, k)
        else:
            raise TypeError(f"unknown source {type(src)}")
    st.total_spilled_rows = total
    if total == 0:
        spill.cleanup()
        from .sdbg import sdbg_from_edges

        return sdbg_from_edges(
            np.zeros((0, w), np.uint32), np.zeros(0, np.int32), k
        )

    rounds = plan_rounds(spill.counts, budget_rows)
    st.n_rounds = len(rounds)
    st.round_ranges = rounds
    log.info(
        "bucketed build k=%d: %d rows spilled, %d rounds (budget %d)",
        k, total, len(rounds), budget_rows,
    )

    # ---- pass 2: per-round sort + dedup; rounds are in prefix order,
    # so concatenating their edges yields the globally sorted edge set.
    # Navigation (run_start/nxt_link/rc) derives lazily from that
    # sorted set inside Sdbg (graph/sdbg.py _nav_links) - the old
    # pass 3 (node/rc join spills + two more sorts per round) is gone.
    all_keys = []
    all_mult = []
    shard_writer = None
    if shard_dir is not None:
        from .sdbg import ShardedSdbgWriter

        shard_writer = ShardedSdbgWriter(shard_dir, k)
    use_grouped = _use_bucket_sort(mesh)

    # prefetch each round's spill files while the previous round sorts
    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(max_workers=1)

    def _read(lo, hi):
        if use_grouped:
            return spill.read_range_grouped(lo, hi)
        return spill.read_range(lo, hi), None

    nxt_fut = ex.submit(_read, *rounds[0]) if rounds else None
    for ri, (lo, hi) in enumerate(rounds):
        rows, bcounts = nxt_fut.result()
        if ri + 1 < len(rounds):
            nxt_fut = ex.submit(_read, *rounds[ri + 1])
        st.max_round_rows = max(st.max_round_rows, len(rows))
        if len(rows) == 0:
            continue
        if use_grouped:
            srows = _sort_rows_grouped(rows, bcounts, mesh)
        else:
            srows = _sort_rows(rows, mesh)
        del rows
        keys = srows[:, :w]
        head = np.empty(len(keys), dtype=bool)
        head[0] = True
        np.any(keys[1:] != keys[:-1], axis=1, out=head[1:])
        tail = np.empty_like(head)
        tail[:-1] = head[1:]
        tail[-1] = True
        edges = np.ascontiguousarray(keys[tail])
        if unit:
            # group sizes ARE the sums (every contribution is 1)
            idx = np.flatnonzero(tail)
            sums = np.empty(len(idx), dtype=np.int64)
            sums[0] = idx[0] + 1
            np.subtract(idx[1:], idx[:-1], out=sums[1:])
            sums = _halve_palindromes(edges, sums, k)
            mult = np.minimum(sums, KMAX_MUL).astype(np.int32)
            if min_count > 1:
                solid = sums >= min_count
                edges = edges[solid]
                mult = mult[solid]
        elif mult_mode == "max":
            # mult is the LAST sort word, so the tail row is the max
            mult = np.minimum(srows[tail, w], KMAX_MUL).astype(np.int32)
        else:
            # group sums via cumulative-sum differences at group tails
            cs = np.cumsum(srows[:, w], dtype=np.int64)
            tails = cs[tail]
            sums = np.diff(np.concatenate([[0], tails]))
            sums = _halve_palindromes(edges, sums, k)
            mult = np.minimum(sums, KMAX_MUL).astype(np.int32)
            if min_count > 1:
                solid = sums >= min_count
                edges = edges[solid]
                mult = mult[solid]
        del srows
        if shard_writer is not None:
            shard_writer.append(edges, np.minimum(mult, KMAX_MUL))
        all_keys.append(edges)
        all_mult.append(mult)
    ex.shutdown(wait=True)
    spill.cleanup()
    if shard_writer is not None:
        shard_writer.finalize()

    keys = np.concatenate(all_keys, axis=0) if all_keys else \
        np.zeros((0, w), np.uint32)
    mult = np.concatenate(all_mult) if all_mult else \
        np.zeros(0, np.int32)
    st.n_edges = len(keys)
    from .sdbg import _make_sdbg

    return _make_sdbg(keys, mult, k)
