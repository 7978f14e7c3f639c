"""Sparse seed read-to-contig mapper.

Reference: HashMapper (src/localasm/hash_mapper.{h,cpp}) - every
`sparsity`-th canonical 31-mer of each contig seeds a hash index; a
read maps by sliding all its seed k-mers, turning hits into clipped
diagonal alignment candidates, scoring each by exact base matches, and
keeping a unique best with >= similarity * length matches.

TPU redesign: the index is a sorted multi-word key array (batched
binary search instead of a hash map); all reads' seed k-mers extract
densely in one gather-free pass; candidate scoring is one vectorized
base-level comparison over (candidate, position) tiles.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import kmerops, packing
from ..utils.log import get_logger
from ..graph.counter import pack_flat

SEED_K = 31
NULL = np.int32(-1)


@dataclass
class SeedIndex:
    keys: np.ndarray  # (S, W) sorted canonical seed k-mers (unique)
    contig_id: np.ndarray  # (S,)
    offset: np.ndarray  # (S,) seed start offset in contig (fwd coords)
    strand: np.ndarray  # (S,) 1 if canonical form is the contig's rc
    contigs: list[np.ndarray]  # contig base codes
    contig_lens: np.ndarray

    @property
    def size(self) -> int:
        return len(self.keys)


def build_seed_index(
    contigs: list[np.ndarray], sparsity: int = 8, seed_k: int = SEED_K
) -> SeedIndex:
    """Index every sparsity-th canonical seed k-mer; k-mers seen at
    more than one (contig, offset) are repeats and dropped (reference
    marks them with the top bit and ignores hits,
    hash_mapper.cpp:84-99)."""
    w = kmerops.words_per_kmer(seed_k)
    lens = np.array([len(c) for c in contigs], dtype=np.int64)
    pos_parts, cid_parts, off_parts = [], [], []
    base = 0
    for cid, codes in enumerate(contigs):
        L = len(codes)
        if L >= seed_k:
            offs = np.arange(0, L - seed_k + 1, sparsity, dtype=np.int64)
            off_parts.append(offs)
            pos_parts.append(base + offs)
            cid_parts.append(np.full(len(offs), cid, np.int32))
        base += L
    if not pos_parts:
        return SeedIndex(np.zeros((0, w), np.uint32), np.zeros(0, np.int32),
                         np.zeros(0, np.int64), np.zeros(0, np.int8),
                         contigs, lens)
    flat, _ = packing.pack_many(contigs)
    n = sum(map(len, pos_parts))
    packed = pack_flat(flat)
    packed = np.concatenate([packed, np.zeros(w + 1, np.uint32)])
    pos = np.concatenate(pos_parts).astype(np.int32)
    keys = np.asarray(
        kmerops.extract_kmers(jnp.asarray(packed), jnp.asarray(pos), seed_k)
    )
    canon, is_rc = kmerops.canonical_kmers(jnp.asarray(keys), seed_k)
    canon, is_rc = np.asarray(canon), np.asarray(is_rc)

    cids = np.concatenate(cid_parts)
    offs = np.concatenate(off_parts)
    order = np.lexsort(tuple(canon[:, i] for i in range(w - 1, -1, -1)))
    canon, is_rc, cids, offs = (
        canon[order], is_rc[order], cids[order], offs[order]
    )
    head = np.ones(n, dtype=bool)
    head[1:] = (canon[1:] != canon[:-1]).any(axis=1)
    # group sizes; keep only singleton seed k-mers
    gid = np.cumsum(head) - 1
    sizes = np.bincount(gid)
    keep = head & (sizes[gid] == 1)
    return SeedIndex(
        canon[keep], cids[keep], offs[keep],
        is_rc[keep].astype(np.int8), contigs, lens,
    )


@dataclass
class MapResult:
    """Per-read best alignment (invalid rows have contig_id == -1)."""

    contig_id: np.ndarray
    contig_from: np.ndarray
    contig_to: np.ndarray
    query_from: np.ndarray
    query_to: np.ndarray
    strand: np.ndarray
    mismatch: np.ndarray

    @property
    def valid(self) -> np.ndarray:
        return self.contig_id >= 0


@functools.partial(jax.jit, static_argnames=("seed_k",))
def _seed_canon(packed, seed_k):
    kmers = kmerops.extract_all_kmers(packed, seed_k)
    return kmerops.canonical_kmers(kmers, seed_k)


@functools.partial(jax.jit, static_argnames=("kmax",))
def _score_spans(qpacked, cpacked, qpos, cpos, span, kmax):
    """Exact-match count over aligned spans, on 2-bit packed words.

    Replaces the reference's byte-wise Match loop (hash_mapper.cpp:
    103-133) with a word-level xor + 2-bit popcount: per candidate,
    ~kmax/16 u32 ops instead of kmax byte compares. span masks the
    tail (left-aligned big-endian 2-bit layout, 16 bases/word)."""
    qw = kmerops.extract_kmers(qpacked, qpos, kmax)  # (N, W)
    cw = kmerops.extract_kmers(cpacked, cpos, kmax)
    x = qw ^ cw
    diff = (x | (x >> jnp.uint32(1))) & jnp.uint32(0x55555555)
    w = qw.shape[1]
    j16 = jnp.arange(w, dtype=jnp.int32) * 16
    b = jnp.clip(span[:, None] - j16[None, :], 0, 16)  # bases in word
    sh = jnp.minimum(32 - 2 * b, 31).astype(jnp.uint32)
    mask = jnp.where(b == 0, jnp.uint32(0),
                     jnp.uint32(0xFFFFFFFF) << sh)
    mism = jax.lax.population_count(diff & mask).sum(
        axis=1, dtype=jnp.int32
    )
    return span - mism


def map_reads(
    flat_codes: np.ndarray,
    starts: np.ndarray,
    index: SeedIndex,
    similarity: float = 0.8,
    min_mapped_len: int = 75,
    seed_k: int = SEED_K,
    chunk_bases: int = 1 << 22,
) -> MapResult:
    """Map every read; returns its unique best alignment or invalid.

    Matches TryMap (hash_mapper.cpp:136-268): candidates from seed
    hits, clipped to the contig, length-filtered, scored by exact
    matches with threshold similarity * aligned_len, ties invalidate.
    """
    chunk_bases = max(1 << 16, (chunk_bases + 15) & ~15)
    log = get_logger()
    n_reads = len(starts) - 1
    out = MapResult(*(np.full(n_reads, -1, dtype=np.int64)
                      for _ in range(7)))
    n_bases = int(starts[-1])
    if index.size == 0 or n_reads == 0 or n_bases < seed_k:
        return out
    from ..graph.counter import as_pool

    w = kmerops.words_per_kmer(seed_k)
    pool = as_pool(flat_codes)
    packed_np = np.concatenate(
        [pool.window_padded(0, pool.n_words),
         np.zeros(w + 1, np.uint32)])
    packed = jnp.asarray(packed_np)

    # native rolling-window scan: canonical probe + bitmap prefilter +
    # binary search per position, threaded over read ranges; reads
    # shorter than max(seed_k, 50) are unreliable and skipped
    # (reference TryMap, hash_mapper.cpp:140)
    from ..native import SCAN_CANON, seed_scan

    scan = seed_scan(packed_np, starts, seed_k, index.keys,
                     SCAN_CANON, min_read_len=max(seed_k, 50))
    if scan is not None:
        sel, rid, h, _, qrc_h = scan
        lengths = np.diff(starts)
    else:
        # fallback (no toolchain): chunked device canonicalize + host
        # u64 binary search; only hit positions survive the chunk loop
        ikeys_u64 = kmerops.keys_to_u64(index.keys, seed_k)
        n_dense = (len(packed_np) - w) * 16
        sel_parts, h_parts, qrc_parts = [], [], []
        from concurrent.futures import ThreadPoolExecutor

        from ..utils.threads import num_threads

        with ThreadPoolExecutor(max_workers=min(8, num_threads())) as tp:
            for lo in range(0, n_bases, chunk_bases):
                hi = min(n_dense, lo + chunk_bases)
                lo_w = lo // 16
                size = min((hi + 15) // 16 + w + 1, len(packed_np)) - lo_w
                sub = jax.lax.dynamic_slice_in_dim(packed, lo_w, size)
                canon, is_rc = _seed_canon(sub, seed_k)
                canon, is_rc = np.asarray(canon), np.asarray(is_rc)
                span = min(min(hi, n_bases) - lo, len(canon))
                q = kmerops.keys_to_u64(canon[:span], seed_k)
                pos, found = kmerops.member_sorted_mt(ikeys_u64, q, tp)
                loc = np.flatnonzero(found)
                sel_parts.append(loc + lo)
                h_parts.append(pos[loc].astype(np.int32))
                qrc_parts.append(is_rc[loc])
                if hi >= n_dense:
                    break
        sel = np.concatenate(sel_parts)
        h = np.concatenate(h_parts)
        qrc_h = np.concatenate(qrc_parts)

        lengths = np.diff(starts)
        rid = np.searchsorted(starts, sel, side="right") - 1
        # window must lie inside one read; reads shorter than
        # max(seed_k, 50) are unreliable (TryMap:140)
        ok = (sel + seed_k <= starts[rid + 1]) & \
            (lengths[rid] >= max(seed_k, 50))
        sel, h, qrc_h, rid = sel[ok], h[ok], qrc_h[ok], rid[ok]
    if len(sel) == 0:
        return out
    # candidate identity is (read, contig, strand, diagonal): the
    # clipped alignment fields are all functions of those four plus
    # the read/contig lengths -- for both strands the unclipped span
    # is [diag, diag + rlen - 1] on the contig and the query offsets
    # are its clip amounts (fwd) / their mirror (rc). Deduplicate on
    # that 4-tuple BEFORE any coordinate math: a perfectly mapped
    # read produces ~rlen/sparsity hits on one diagonal, so adjacent
    # duplicates dominate and hits arrive position-sorted (grouped by
    # read).
    rid = rid.astype(np.int32, copy=False)
    rlen32 = lengths.astype(np.int32)
    i = (sel - starts[rid]).astype(np.int32) + np.int32(seed_k - 1)
    mstrand = (index.strand[h].astype(np.uint8)
               ^ qrc_h.astype(np.uint8)).astype(np.int8)
    coff = index.offset[h].astype(np.int32)
    cid = index.contig_id[h]
    rl = rlen32[rid]
    diag = np.where(mstrand == 0, coff - i + np.int32(seed_k - 1),
                    coff - rl + np.int32(1) + i)
    # pass 1: drop consecutive repeats of the same candidate
    nn = len(rid)
    first = np.ones(nn, dtype=bool)
    first[1:] = ((rid[1:] != rid[:-1]) | (cid[1:] != cid[:-1])
                 | (mstrand[1:] != mstrand[:-1]) | (diag[1:] != diag[:-1]))
    rid, cid, mstrand, diag = (
        x[first] for x in (rid, cid, mstrand, diag)
    )
    # pass 2: full dedup via 2 packed u64 sort keys (native parallel
    # MSD row sort when available; equal keys are dropped as
    # duplicates, so unstable order is fine)
    ka = (rid.astype(np.uint64) << np.uint64(1)) \
        | (mstrand & 1).astype(np.uint64)
    kb = (cid.astype(np.uint64) << np.uint64(32)) \
        | (diag.astype(np.int64) + (1 << 31)).astype(np.uint64)
    from ..native import argsort_rows as _native_argsort_rows

    # any total order groups identical keys (all the dedup needs), so
    # lead with a multiplicative hash of the key to give the MSD pass
    # a uniform top byte; words 1-3 carry the full original key (ka <
    # 2^32: rid<<1|strand), so equal rows <=> equal candidates exactly
    order = None
    if ka.max(initial=0) < (1 << 32):  # ka32 below must be lossless
        ka32 = (ka & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        kbh = (kb >> np.uint64(32)).astype(np.uint32)
        kbl = (kb & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        rows4 = np.empty((len(ka), 4), np.uint32)
        rows4[:, 0] = (ka32 * np.uint32(2654435761)) ^ (
            kbl * np.uint32(0x9E3779B9))
        rows4[:, 1] = ka32
        rows4[:, 2] = kbh
        rows4[:, 3] = kbl
        order = _native_argsort_rows(rows4)
    if order is None:
        order = np.lexsort((kb, ka))
    kas, kbs = ka[order], kb[order]
    keep = np.ones(len(order), dtype=bool)
    keep[1:] = (kas[1:] != kas[:-1]) | (kbs[1:] != kbs[:-1])
    sel_rows = order[keep]
    rid, cid, mstrand, diag = (
        x[sel_rows] for x in (rid, cid, mstrand, diag)
    )

    # clipped alignment fields (reference TryMap candidate clipping,
    # hash_mapper.cpp:174-214), now over the deduplicated set only
    rl = rlen32[rid]
    clen = index.contig_lens[cid].astype(np.int32)
    cfrom = np.maximum(diag, 0)
    cto = np.minimum(clen - np.int32(1), diag + rl - np.int32(1))
    alen = cto - cfrom + np.int32(1)
    ok = (alen >= rl) | (alen >= min_mapped_len)
    rid, cid, mstrand, diag, cfrom, cto, rl = (
        x[ok] for x in (rid, cid, mstrand, diag, cfrom, cto, rl)
    )
    qfrom = np.where(mstrand == 0, cfrom - diag,
                     rl - np.int32(1) - (cto - diag))
    qto = np.where(mstrand == 0, cto - diag,
                   rl - np.int32(1) - (cfrom - diag))
    n_cand = len(rid)
    if n_cand == 0:
        return out

    # score: exact base matches over the aligned span, packed-word
    # xor + popcount on device (reference Match, hash_mapper.cpp:
    # 103-133). Minus-strand spans read forward from an rc-packed
    # contig pool (contig[cfrom..cto] reversed-complemented starts at
    # rc-coordinate clen-1-cto).
    span_len = qto - qfrom + 1
    kmax = int(lengths.max())
    wk = kmerops.words_per_kmer(kmax)
    contig_flat, contig_starts = packing.pack_many(index.contigs)
    rc_flat, rc_starts = packing.pack_many(
        [packing.revcomp_codes(c) for c in index.contigs]
    )
    cpacked = np.concatenate(
        [pack_flat(contig_flat), pack_flat(rc_flat),
         np.zeros(wk + 1, np.uint32)]
    )
    rc_word_base = (len(contig_flat) + 15) // 16 * 16  # rc pool offset
    clen_c = index.contig_lens[cid]
    cpos_g = np.where(
        mstrand == 0,
        contig_starts[cid] + cfrom,
        rc_word_base + rc_starts[cid] + (clen_c - 1 - cto),
    )
    qpos_g = starts[rid] + qfrom
    qpacked = np.concatenate([packed_np, np.zeros(wk + 1, np.uint32)])
    # pow2 capacity padding: one compile per size bucket
    cap = max(16, 1 << int(np.ceil(np.log2(n_cand))))
    pad = cap - n_cand

    def padded(a):
        return np.concatenate([a, np.zeros(pad, a.dtype)]).astype(
            np.int32
        )

    matches = np.asarray(_score_spans(
        jnp.asarray(qpacked), jnp.asarray(cpacked),
        jnp.asarray(padded(qpos_g)), jnp.asarray(padded(cpos_g)),
        jnp.asarray(padded(span_len)), kmax,
    ))[:n_cand].astype(np.int64)
    threshold = np.round(similarity * span_len).astype(np.int64)
    matches = np.where(matches >= threshold, matches, 0)

    # unique best per read: sort by (read, -matches); ties invalidate
    order = np.lexsort((-matches, rid))
    rid_s = rid[order]
    m_s = matches[order]
    first = np.ones(n_cand, dtype=bool)
    first[1:] = rid_s[1:] != rid_s[:-1]
    best_rows = np.flatnonzero(first)
    nxt = best_rows + 1
    tie = (nxt < n_cand) & (rid_s[np.minimum(nxt, n_cand - 1)] ==
                            rid_s[best_rows]) & \
          (m_s[np.minimum(nxt, n_cand - 1)] == m_s[best_rows])
    good = best_rows[(m_s[best_rows] > 0) & ~tie]
    sel_rows = order[good]

    r = rid[sel_rows]
    out.contig_id[r] = cid[sel_rows]
    out.contig_from[r] = cfrom[sel_rows]
    out.contig_to[r] = cto[sel_rows]
    out.query_from[r] = qfrom[sel_rows]
    out.query_to[r] = qto[sel_rows]
    out.strand[r] = mstrand[sel_rows]
    out.mismatch[r] = (qto - qfrom + 1)[sel_rows] - matches[sel_rows]
    log.info(
        "mapper: %d/%d reads aligned (%d seeds indexed)",
        len(sel_rows), n_reads, index.size,
    )
    return out
