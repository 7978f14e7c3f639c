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
from ..graph.counter import pack_flat, window_valid_mask

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
    rows_k, rows_c, rows_o = [], [], []
    for cid, codes in enumerate(contigs):
        L = len(codes)
        if L < seed_k:
            continue
        offs = np.arange(0, L - seed_k + 1, sparsity, dtype=np.int64)
        for o in offs:
            rows_k.append(codes[o : o + seed_k])
            rows_c.append(cid)
            rows_o.append(o)
    lens = np.array([len(c) for c in contigs], dtype=np.int64)
    if not rows_k:
        return SeedIndex(np.zeros((0, w), np.uint32), np.zeros(0, np.int32),
                         np.zeros(0, np.int64), np.zeros(0, np.int8),
                         contigs, lens)
    flat, starts = packing.pack_many([np.concatenate(rows_k)])
    n = len(rows_k)
    packed = pack_flat(flat)
    packed = np.concatenate([packed, np.zeros(w + 1, np.uint32)])
    pos = (np.arange(n, dtype=np.int64) * seed_k).astype(np.int32)
    keys = np.asarray(
        kmerops.extract_kmers(jnp.asarray(packed), jnp.asarray(pos), seed_k)
    )
    canon, is_rc = kmerops.canonical_kmers(jnp.asarray(keys), seed_k)
    canon, is_rc = np.asarray(canon), np.asarray(is_rc)

    cids = np.array(rows_c, dtype=np.int32)
    offs = np.array(rows_o, dtype=np.int64)
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
    if index.size == 0 or n_reads == 0:
        return out
    n_bases = int(starts[-1])
    w = kmerops.words_per_kmer(seed_k)
    packed_np = pack_flat(flat_codes)
    packed_np = np.concatenate([packed_np, np.zeros(w + 1, np.uint32)])
    packed = jnp.asarray(packed_np)
    # seed_k = 31 <= 32: host u64 binary search over the seed index
    # (device searchsorted costs log(S) random gathers per position)
    ikeys_u64 = kmerops.keys_to_u64(index.keys, seed_k)

    hit = np.full(n_bases, NULL, dtype=np.int32)
    qrc = np.zeros(n_bases, dtype=bool)
    n_dense = (len(packed_np) - w) * 16
    from concurrent.futures import ThreadPoolExecutor

    from ..utils.threads import num_threads

    with ThreadPoolExecutor(max_workers=min(8, num_threads())) as pool:
        for lo in range(0, n_bases, chunk_bases):
            hi = min(n_dense, lo + chunk_bases)
            lo_w = lo // 16
            size = min((hi + 15) // 16 + w + 1, len(packed_np)) - lo_w
            sub = jax.lax.dynamic_slice_in_dim(packed, lo_w, size)
            canon, is_rc = _seed_canon(sub, seed_k)
            canon, is_rc = np.asarray(canon), np.asarray(is_rc)
            span = min(min(hi, n_bases) - lo, len(canon))
            q = kmerops.keys_to_u64(canon[:span], seed_k)
            pos, found = kmerops.member_sorted_mt(ikeys_u64, q, pool)
            hit[lo : lo + span] = np.where(found, pos, NULL)
            qrc[lo : lo + span] = is_rc[:span]
            if hi >= n_dense:
                break
    valid = window_valid_mask(starts, seed_k, n_bases)
    hit[~valid] = NULL

    lengths = np.diff(starts)
    read_of = np.repeat(np.arange(n_reads), lengths)
    rstart_of = np.repeat(starts[:-1], lengths)

    sel = np.flatnonzero(hit >= 0)
    # reads shorter than max(seed_k, 50) are unreliable (TryMap:140)
    sel = sel[lengths[read_of[sel]] >= max(seed_k, 50)]
    if len(sel) == 0:
        return out
    h = hit[sel]
    rid = read_of[sel]
    rlen = lengths[rid]
    # seed END position within the read (reference i)
    i = (sel - rstart_of[sel]) + seed_k - 1
    cstrand = index.strand[h].astype(np.int64)
    qstrand = qrc[sel].astype(np.int64)
    mstrand = cstrand ^ qstrand
    coff = index.offset[h]
    cid = index.contig_id[h].astype(np.int64)
    clen = index.contig_lens[cid]

    cfrom = np.where(
        mstrand == 0, coff - (i - seed_k + 1), coff - (rlen - 1 - i)
    )
    cto = np.where(
        mstrand == 0, coff + seed_k - 1 + rlen - 1 - i, coff + i
    )
    cfrom = np.maximum(cfrom, 0)
    cto = np.minimum(clen - 1, cto)
    alen = cto - cfrom + 1
    ok = (alen >= rlen) | (alen >= min_mapped_len)
    qfrom = np.where(
        mstrand == 0, i - (seed_k - 1) - (coff - cfrom), i - (cto - coff)
    )
    qto = np.where(
        mstrand == 0, i - (seed_k - 1) + (cto - coff), i + (coff - cfrom)
    )
    sel, rid, cid, cfrom, cto, qfrom, qto, mstrand = (
        x[ok] for x in (sel, rid, cid, cfrom, cto, qfrom, qto, mstrand)
    )

    # dedup candidates per read (lexsort + row-diff; np.unique(axis=0)
    # takes a slow void-dtype sort path)
    cand = np.stack([rid, cid, cfrom, cto, qfrom, qto, mstrand], axis=1)
    order = np.lexsort(tuple(cand[:, i] for i in range(6, -1, -1)))
    cand = cand[order]
    keep = np.ones(len(cand), dtype=bool)
    keep[1:] = (cand[1:] != cand[:-1]).any(axis=1)
    cand = cand[keep]
    rid, cid, cfrom, cto, qfrom, qto, mstrand = cand.T
    n_cand = len(rid)
    if n_cand == 0:
        return out

    # score: exact base matches over the aligned span (vectorized over
    # candidates x positions; reference Match, hash_mapper.cpp:103-133)
    max_alen = int((qto - qfrom + 1).max())
    j = np.arange(max_alen)
    qpos = starts[rid][:, None] + qfrom[:, None] + j[None, :]
    in_span = j[None, :] <= (qto - qfrom)[:, None]
    qpos = np.minimum(qpos, n_bases - 1)
    qb = flat_codes[qpos]
    # reference base at the same alignment column
    contig_flat, contig_starts = packing.pack_many(index.contigs) \
        if index.contigs else (np.zeros(0, np.uint8), np.zeros(1, np.int64))
    cpos_fwd = contig_starts[cid][:, None] + cfrom[:, None] + j[None, :]
    cpos_rc = contig_starts[cid][:, None] + cto[:, None] - j[None, :]
    cpos = np.where(mstrand[:, None] == 0, cpos_fwd, cpos_rc)
    cpos = np.clip(cpos, 0, len(contig_flat) - 1)
    cb = contig_flat[cpos]
    cb = np.where(mstrand[:, None] == 1, 3 - cb, cb)
    matches = ((qb == cb) & in_span).sum(axis=1)
    span_len = qto - qfrom + 1
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
