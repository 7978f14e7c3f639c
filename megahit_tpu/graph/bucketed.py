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
  * Pass 2 sorts each round on device (optionally sharded over a mesh
    via the distributed sample sorter), dedups with max-multiplicity
    (the mult word is the LAST sort word, so the max is the tail row of
    each group), assigns global edge ids in round order (rounds are in
    prefix order, so the concatenation is globally sorted), and spills
    node-join rows and rc-query rows bucketed by THEIR key prefixes.
  * Pass 3 re-loads each round, sorts its node rows, builds per-node
    out/in candidate tables and scatters them into the global (E, 4)
    arrays; rc indices come from a tag-paired sort-join per round.

Working-set memory is bounded by the round budget; the full window
multiset only ever exists on disk (like the reference's edge files).
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

N_BUCKETS = 256  # top 8 bits of word0 = first 4 bases


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
    reference's per-thread bucket-sharded files, sdbg_writer.h:19-63)."""

    def __init__(self, dir_: str, name: str, row_words: int):
        os.makedirs(dir_, exist_ok=True)
        self.paths = [
            os.path.join(dir_, f"{name}.{b:03d}.bin")
            for b in range(N_BUCKETS)
        ]
        self.row_words = row_words
        self.counts = np.zeros(N_BUCKETS, dtype=np.int64)
        for p in self.paths:
            if os.path.exists(p):
                os.remove(p)

    def append(self, rows: np.ndarray) -> None:
        """rows: (N, row_words) uint32; bucketed by rows[:,0] >> 24."""
        if not len(rows):
            return
        b = (rows[:, 0] >> np.uint32(24)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        rows = rows[order]
        b = b[order]
        sizes = np.bincount(b, minlength=N_BUCKETS)
        self.counts += sizes
        offs = np.zeros(N_BUCKETS + 1, dtype=np.int64)
        np.cumsum(sizes, out=offs[1:])
        for i in np.nonzero(sizes)[0]:
            with open(self.paths[i], "ab") as fh:
                fh.write(rows[offs[i]:offs[i + 1]].tobytes())

    def read_range(self, lo: int, hi: int) -> np.ndarray:
        """All rows of buckets [lo, hi)."""
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

    def cleanup(self) -> None:
        for p in self.paths:
            if os.path.exists(p):
                os.remove(p)


def plan_rounds(counts: np.ndarray, budget_rows: int) -> list[tuple[int, int]]:
    """Greedy contiguous bucket ranges with total rows <= budget
    (reference Lv1FindEndBuckets, base_engine.cpp:254-281). A single
    bucket larger than the budget becomes its own (oversized) round."""
    log = get_logger()
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
    strands, carrying its sequence's multiplicity."""

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
                batch_windows: int) -> int:
    """Stream-extract all window rows of a pool into the spill set.
    Mirrors sdbg.window_edge_multiset's chunking, but rows go to disk
    instead of host lists. Returns total rows spilled."""
    import jax

    w = kmerops.words_per_kmer(k)
    n_bases = int(src.starts[-1])
    if n_bases < k:
        return 0
    valid_all = window_valid_mask(src.starts, k, n_bases)
    if not valid_all.any():
        return 0
    packed_np = np.concatenate(
        [pack_flat(src.flat_codes), np.zeros(w + 1, dtype=np.uint32)]
    )
    packed = jnp.asarray(packed_np)
    mult_at = np.repeat(
        np.asarray(src.mults, dtype=np.int32), np.diff(src.starts)
    )
    n_dense = (len(packed_np) - w) * 16
    chunk = max(1 << 16, (batch_windows + 15) & ~15)
    total = 0
    for lo in range(0, n_bases, chunk):
        hi = min(n_dense, lo + chunk)
        lo_w = lo // 16
        size = min((hi + 15) // 16 + w + 1, len(packed_np)) - lo_w
        sub = jax.lax.dynamic_slice_in_dim(packed, lo_w, size)
        fwd = np.asarray(kmerops.extract_all_kmers(sub, k))
        span = min(min(hi, n_bases) - lo, fwd.shape[0])
        vm = valid_all[lo : lo + span]
        fwd_c = fwd[:span][vm]
        rc_c = np_revcomp(fwd_c, k)
        mm = mult_at[lo : lo + span][vm].astype(np.uint32)
        rows = np.empty((2 * len(fwd_c), w + 1), np.uint32)
        rows[: len(fwd_c), :w] = fwd_c
        rows[len(fwd_c):, :w] = rc_c
        rows[: len(fwd_c), w] = mm
        rows[len(fwd_c):, w] = mm
        spill.append(rows)
        total += len(rows)
        if hi >= n_dense:
            break
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
    """
    log = get_logger()
    w = kmerops.words_per_kmer(k)
    st = stats if stats is not None else BuildStats()

    # ---- pass 1: spill the window multiset, bucketed by key prefix
    spill = SpillSet(spill_dir, "edges", w + 1)
    total = 0
    for src in sources:
        if isinstance(src, PoolSource):
            total += _spill_pool(spill, src, k, batch_windows)
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

    # ---- pass 2: per-round sort + dedup-max; spill node/rc join rows
    node_spill = SpillSet(spill_dir, "nodes", w + 2)
    rc_spill = SpillSet(spill_dir, "rcq", w + 1)
    round_paths = []
    offsets = [0]
    for ri, (lo, hi) in enumerate(rounds):
        rows = spill.read_range(lo, hi)
        st.max_round_rows = max(st.max_round_rows, len(rows))
        if len(rows) == 0:
            round_paths.append(None)
            offsets.append(offsets[-1])
            continue
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
        if mult_mode == "max":
            # mult is the LAST sort word, so the tail row is the max
            mult = np.minimum(srows[tail, w], KMAX_MUL).astype(np.int32)
        else:
            # group sums via cumulative-sum differences at group tails
            cs = np.cumsum(srows[:, w], dtype=np.int64)
            tails = cs[tail]
            sums = np.diff(np.concatenate([[0], tails]))
            mult = np.minimum(sums, KMAX_MUL).astype(np.int32)
            if min_count > 1:
                solid = sums >= min_count
                edges = edges[solid]
                mult = mult[solid]
        del srows
        e = len(edges)
        off = offsets[-1]
        gids = (off + np.arange(e, dtype=np.int64)).astype(np.uint32)

        # node-join rows: (node key, eid, kind*4+base) for both the
        # prefix node (kind 0, base = last) and suffix node (kind 1,
        # base = first); bucketed by NODE prefix
        prefix = np_mask_tail(edges, k - 1)
        suffix = np_mask_tail(np_drop_first_base(edges, k), k - 1)
        first = np_get_base(edges, 0).astype(np.uint32)
        last = np_get_base(edges, k - 1).astype(np.uint32)
        nrows = np.empty((2 * e, w + 2), np.uint32)
        nrows[:e, :w] = prefix
        nrows[e:, :w] = suffix
        nrows[:e, w] = gids
        nrows[e:, w] = gids
        nrows[:e, w + 1] = last          # kind 0: out-edge of node
        nrows[e:, w + 1] = 4 + first     # kind 1: in-edge of node
        node_spill.append(nrows)
        del nrows

        # rc queries: (rc key, eid) — answered in the round owning rc key
        rcq = np.empty((e, w + 1), np.uint32)
        rcq[:, :w] = np_revcomp(edges, k)
        rcq[:, w] = gids
        rc_spill.append(rcq)
        del rcq

        path = os.path.join(spill_dir, f"round.{ri:04d}.npz")
        np.savez(path, keys=edges, mult=mult)
        round_paths.append(path)
        offsets.append(off + e)
    spill.cleanup()
    n_edges = offsets[-1]
    st.n_edges = n_edges

    # ---- pass 3: per-round node tables + rc join
    oc_t = np.full((n_edges, 4), NULL, np.int32)
    ic_t = np.full((n_edges, 4), NULL, np.int32)
    oc_s = np.full((n_edges, 4), NULL, np.int32)
    ic_s = np.full((n_edges, 4), NULL, np.int32)
    rc_idx = np.full(n_edges, NULL, np.int32)
    all_keys = []
    all_mult = []
    for ri, (lo, hi) in enumerate(rounds):
        if round_paths[ri] is None:
            continue
        z = np.load(round_paths[ri])
        edges, mult = z["keys"], z["mult"]
        all_keys.append(edges)
        all_mult.append(mult)
        off = offsets[ri]
        e = len(edges)

        # node grouping (the bucketed form of sdbg._neighbor_tables'
        # sort-join): rows sorted by node key; per-group (out, in)
        # tables indexed by base, then scattered to the rows' edges
        nrows = node_spill.read_range(lo, hi)
        snode = _sort_rows(nrows, mesh)
        del nrows
        nkeys = snode[:, :w]
        eid = snode[:, w].astype(np.int64)
        aux = snode[:, w + 1]
        head = np.empty(len(nkeys), dtype=bool)
        if len(nkeys):
            head[0] = True
            np.any(nkeys[1:] != nkeys[:-1], axis=1, out=head[1:])
        gid_local = np.cumsum(head, dtype=np.int64) - 1
        n_groups = int(gid_local[-1]) + 1 if len(nkeys) else 0
        tabs = np.full(n_groups * 8 + 1, NULL, np.int32)
        tabs[gid_local * 8 + aux] = eid.astype(np.int32)
        tabs = tabs[:-1].reshape(n_groups, 2, 4)
        out_tab = tabs[gid_local, 0]  # (R, 4)
        in_tab = tabs[gid_local, 1]
        is_prefix = aux < 4
        oc_s[eid[is_prefix]] = out_tab[is_prefix]
        ic_s[eid[is_prefix]] = in_tab[is_prefix]
        oc_t[eid[~is_prefix]] = out_tab[~is_prefix]
        ic_t[eid[~is_prefix]] = in_tab[~is_prefix]
        del snode, nkeys, gid_local, tabs, out_tab, in_tab

        # rc join: tag-paired sort (edge rows tag 0, query rows tag 1);
        # rc is a bijection so rows pair up exactly 2-by-2
        rcq = rc_spill.read_range(lo, hi)
        assert len(rcq) == e, (len(rcq), e)
        pair = np.empty((2 * e, w + 2), np.uint32)
        pair[:e, :w] = edges
        pair[:e, w] = 0
        pair[:e, w + 1] = (off + np.arange(e, dtype=np.int64)).astype(
            np.uint32
        )
        pair[e:, :w] = rcq[:, :w]
        pair[e:, w] = 1
        pair[e:, w + 1] = rcq[:, w]
        del rcq
        spair = _sort_rows(pair, mesh)
        del pair
        a = spair[0::2]
        b = spair[1::2]
        assert (a[:, :w] == b[:, :w]).all() and (a[:, w] == 0).all() \
            and (b[:, w] == 1).all(), "rc pairing: edge set not closed"
        rc_idx[b[:, w + 1].astype(np.int64)] = a[:, w + 1].astype(
            np.int32
        )
        del spair
    node_spill.cleanup()
    rc_spill.cleanup()
    for p in round_paths:
        if p is not None:
            os.remove(p)

    keys = np.concatenate(all_keys, axis=0) if all_keys else \
        np.zeros((0, w), np.uint32)
    mult = np.concatenate(all_mult) if all_mult else \
        np.zeros(0, np.int32)
    from .sdbg import _make_sdbg

    return _make_sdbg(keys, mult, rc_idx, oc_t, ic_t, oc_s, ic_s, k)
