"""Device-mesh sharded k-mer counting: the scale-out path.

The reference partitions (k+1)-mers into 65,536 prefix buckets and
schedules bucket ranges under a memory budget on one node
(src/sorting/base_engine.cpp:176-281). The TPU-native redesign shards
work over a ``jax.sharding.Mesh``: every chip extracts canonical k-mers
from its shard of read windows, routes each k-mer to an owner chip by a
hash of its key (uniform, unlike prefix buckets which are skewed toward
A/C-leading canonical k-mers), shuffles with one ``all_to_all`` over
ICI, then counts locally with a sort + segment-reduce. Each distinct
k-mer is counted on exactly one chip, so the union of per-chip results
is the global answer - no second reduction needed.

The all_to_all uses a fixed per-destination capacity (static shapes for
XLA); an overflow counter is returned so callers can detect truncation
and retry with a higher capacity factor. With a uniform hash the load
per destination concentrates tightly around B/n, so the default 2x
capacity virtually never overflows.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import kmerops

U32 = jnp.uint32


def kmer_hash(keys: jnp.ndarray) -> jnp.ndarray:
    """Mix the words of each (N, W) key into one uint32 hash.

    Murmur3-style finalizer per word, combined with rotation - plays the
    role of the reference's XXH3 KmerHash (src/sequence/kmer_plus.h:31).
    """
    h = jnp.zeros(keys.shape[:-1], dtype=U32)
    for i in range(keys.shape[-1]):
        x = keys[..., i]
        x = x * U32(0xCC9E2D51)
        x = (x << U32(15)) | (x >> U32(17))
        x = x * U32(0x1B873593)
        h = h ^ x
        h = (h << U32(13)) | (h >> U32(19))
        h = h * U32(5) + U32(0xE6546B64)
    h = h ^ (h >> U32(16))
    h = h * U32(0x85EBCA6B)
    h = h ^ (h >> U32(13))
    h = h * U32(0xC2B2AE35)
    h = h ^ (h >> U32(16))
    return h


def _route_to_buffer(keys, valid, n_dev: int, capacity: int):
    """Scatter (B, W) keys into an (n_dev, capacity, W) send buffer by
    hash-owner, sentinel-filled. Returns (buffer, n_overflowed)."""
    b, w = keys.shape
    dst = (kmer_hash(keys) % U32(n_dev)).astype(jnp.int32)
    dst = jnp.where(valid, dst, n_dev)  # invalid rows route nowhere

    # rank of each row within its destination group
    order = jnp.argsort(dst, stable=True)
    sdst = dst[order]
    idx = jnp.arange(b, dtype=jnp.int32)
    head = jnp.concatenate([jnp.ones(1, bool), sdst[1:] != sdst[:-1]])
    group_start = jnp.where(head, idx, 0)
    group_start = jax.lax.associative_scan(jnp.maximum, group_start)
    rank_sorted = idx - group_start
    rank = jnp.zeros(b, jnp.int32).at[order].set(rank_sorted)

    ok = (dst < n_dev) & (rank < capacity)
    n_overflow = jnp.sum((dst < n_dev) & (rank >= capacity))
    flat_pos = jnp.where(ok, dst * capacity + rank, n_dev * capacity)
    buf = jnp.full((n_dev * capacity + 1, w), 0xFFFFFFFF, dtype=U32)
    buf = buf.at[flat_pos].set(keys, mode="drop")
    return buf[:-1].reshape(n_dev, capacity, w), n_overflow


def _count_local(keys, valid):
    """Sort local keys and run-length count. Returns
    (sorted keys, counts on head rows, head mask)."""
    w = keys.shape[-1]
    sentinel = jnp.full_like(keys, 0xFFFFFFFF)
    keys = jnp.where(valid[:, None], keys, sentinel)
    skeys, svalid = kmerops.sort_keys_with_payload(keys, valid)
    head, counts = kmerops.count_sorted_runs(skeys, svalid)
    return skeys, counts, head


def make_sharded_counter(mesh: Mesh, k1: int, axis: str = "shard",
                         capacity_factor: float = 2.0):
    """Build the jitted sharded count step over `mesh`.

    Returns fn(packed, positions, valid) where positions/valid are
    sharded (n*B,) arrays and packed is replicated; output arrays are
    sharded (n*C',) with per-row (keys, counts, head, n_overflow).
    """
    n_dev = int(np.prod(list(mesh.shape.values())))

    def step(packed, positions, valid):
        # capacity is per-(source, destination): size from the PER-DEVICE
        # row count so buffers shrink as chips are added (the global
        # count here would pin send/recv memory at 2x the whole input)
        per_dev = positions.shape[0] // n_dev
        capacity = max(
            16, int(np.ceil(per_dev * capacity_factor / n_dev))
        )

        def local(packed, positions, valid):
            # shard_map bodies see the per-device block with a leading
            # singleton for the sharded axis
            pos = positions.reshape(-1)
            val = valid.reshape(-1)
            keys = kmerops.extract_kmers(packed, pos, k1)
            canon, _ = kmerops.canonical_kmers(keys, k1)
            # explicit validity column: an all-ones key is a legal
            # canonical k-mer when 16 | k1, so padding can't be
            # recognized by key pattern alone
            aug = jnp.concatenate(
                [canon, val.astype(U32)[:, None]], axis=1
            )
            buf, n_over = _route_to_buffer(aug, val, n_dev, capacity)
            recv = jax.lax.all_to_all(
                buf, axis, split_axis=0, concat_axis=0, tiled=False
            )  # (n_dev, capacity, W+1): row i from device i
            ra = recv.reshape(n_dev * capacity, -1)
            rk = ra[:, :-1]
            rvalid = ra[:, -1] == U32(1)
            skeys, counts, head = _count_local(rk, rvalid)
            n_over = jax.lax.psum(n_over, axis)
            return (skeys[None], counts[None], head[None],
                    jnp.full((1,), n_over, jnp.int32))

        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
        )
        return fn(packed, positions.reshape(n_dev, -1),
                  valid.reshape(n_dev, -1))

    return jax.jit(step)


def make_sharded_sorter(mesh: Mesh, w: int, axis: str = "shard",
                        capacity_factor: float = 2.5):
    """Distributed sample sort of (N, W) multi-word keys over `mesh`.

    The scale-out replacement for the graph-build sort (reference: the
    bucket-sharded CX1 output files merged by bucket metadata,
    edge_io_meta.h): each chip sorts its shard, samples splitters,
    all_gathers them, routes rows to owner chips by splitter bin with
    one capacity-bounded all_to_all, and locally sorts again - the
    concatenation of per-chip results is globally sorted.

    Ties are broken by an appended (device, rank) word before splitting
    so runs of equal keys (poly-A-like data) spread evenly across bins
    instead of overflowing one chip; the word refines key order, so
    global sortedness is preserved.

    Returns fn(keys_shards, valid_shards) -> (sorted keys per shard,
    valid mask per shard, overflow count).
    """
    n_dev = int(np.prod(list(mesh.shape.values())))

    def step(keys, valid):
        b = keys.shape[1]  # per-device rows
        capacity = max(16, int(np.ceil(b * capacity_factor / n_dev)))
        n_samples = 32 * n_dev

        def local(keys, valid):
            k = keys.reshape(b, w)
            v = valid.reshape(b)
            sentinel = jnp.full_like(k, 0xFFFFFFFF)
            k = jnp.where(v[:, None], k, sentinel)
            sk, sv = kmerops.sort_keys_with_payload(k, v)

            # tie-break word: globally unique, uniform across devices
            # for equal keys (rank-major so equal keys interleave)
            dev = jax.lax.axis_index(axis).astype(jnp.uint32)
            tie = (jnp.arange(b, dtype=jnp.uint32) * jnp.uint32(n_dev)
                   + dev)
            ska = jnp.concatenate([sk, tie[:, None]], axis=1)

            # evenly-spaced local samples spanning the WHOLE shard
            # (a strided prefix skews splitters when b > n_samples*stride)
            sample_idx = (jnp.arange(n_samples, dtype=jnp.int32)
                          * b) // n_samples
            samples = ska[sample_idx]
            all_samples = jax.lax.all_gather(
                samples, axis, axis=0, tiled=True
            )
            ssamp = kmerops.sort_keys_with_payload(all_samples)[0]
            # n_dev-1 splitters at even quantiles
            step_q = ssamp.shape[0] // n_dev
            splitters = ssamp[step_q::step_q][: n_dev - 1]

            # destination = number of splitters <= row (searchsorted
            # over a tiny array: n_dev-1 compares, unrolled)
            dst = jnp.zeros(b, jnp.int32)
            for i in range(n_dev - 1):
                le = ~kmerops.lex_less(
                    ska, jnp.broadcast_to(splitters[i], ska.shape)
                )  # row >= splitter_i
                dst = dst + le.astype(jnp.int32)
            dst = jnp.where(sv, dst, n_dev)

            # capacity-bounded routing (same machinery as the counter)
            idx = jnp.arange(b, dtype=jnp.int32)
            head = jnp.concatenate(
                [jnp.ones(1, bool), dst[1:] != dst[:-1]]
            )
            group_start = jnp.where(head, idx, 0)
            group_start = jax.lax.associative_scan(
                jnp.maximum, group_start
            )
            rank = idx - group_start
            ok = (dst < n_dev) & (rank < capacity)
            n_over = jnp.sum((dst < n_dev) & (rank >= capacity))
            flat_pos = jnp.where(
                ok, dst * capacity + rank, n_dev * capacity
            )
            buf = jnp.full((n_dev * capacity + 1, w), 0xFFFFFFFF, U32)
            buf = buf.at[flat_pos].set(sk, mode="drop")
            buf = buf[:-1].reshape(n_dev, capacity, w)
            recv = jax.lax.all_to_all(
                buf, axis, split_axis=0, concat_axis=0, tiled=False
            ).reshape(n_dev * capacity, w)
            rvalid = jnp.any(recv != U32(0xFFFFFFFF), axis=-1)
            out_k, out_v = kmerops.sort_keys_with_payload(recv, rvalid)
            n_over = jax.lax.psum(n_over, axis)
            return (out_k[None], out_v[None],
                    jnp.full((1,), n_over, jnp.int32))

        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
        )
        return fn(keys, valid)

    return jax.jit(step)


def sharded_sort_kmers(
    keys: np.ndarray, mesh: Mesh, axis: str = "shard",
) -> np.ndarray:
    """Globally sort (N, W) keys across the mesh; host wrapper.

    Sentinel (all-ones) rows are treated as padding and dropped."""
    n_dev = int(np.prod(list(mesh.shape.values())))
    n, w = keys.shape
    npad = -(-n // n_dev) * n_dev
    kp = np.full((npad, w), 0xFFFFFFFF, np.uint32)
    kp[:n] = keys
    vp = np.zeros(npad, dtype=bool)
    vp[:n] = ~np.all(keys == 0xFFFFFFFF, axis=1)

    from .multihost import fetch_global, put_global

    kd = put_global(kp.reshape(n_dev, npad // n_dev, w), mesh, P(axis))
    vd = put_global(vp.reshape(n_dev, npad // n_dev), mesh, P(axis))
    fn = make_sharded_sorter(mesh, w, axis)
    out_k, out_v, n_over = fn(kd, vd)
    if int(fetch_global(n_over)[0]) != 0:
        # a source shard concentrated one splitter bin (e.g. the input
        # was already key-clustered across shards); retry with the
        # guaranteed capacity = full shard per destination
        fn = make_sharded_sorter(mesh, w, axis,
                                 capacity_factor=float(n_dev))
        out_k, out_v, n_over = fn(kd, vd)
    assert int(fetch_global(n_over)[0]) == 0, (
        "sample-sort overflow at guaranteed capacity (bug)"
    )
    out_k = fetch_global(out_k).reshape(-1, w)
    out_v = fetch_global(out_v).reshape(-1)
    return out_k[out_v]


def sharded_count_kmers(
    flat_codes: np.ndarray,
    starts: np.ndarray,
    k1: int,
    min_count: int,
    mesh: Mesh,
    axis: str = "shard",
    return_rare: bool = False,
) -> tuple[np.ndarray, ...]:
    """Multi-chip canonical k-mer count; host-side wrapper.

    Same contract as graph.counter.count_canonical_kmers but distributed
    over `mesh`. Result keys are globally deduplicated (hash ownership)
    and sorted on host after the gather. With return_rare=True, also
    returns the sorted NON-solid distinct keys (count < min_count) -
    the mercy candidate-read filter basis, same as the single-device
    counter's return_rare (mercy would otherwise full-scan the pool on
    mesh runs).
    """
    from ..graph.counter import as_pool, window_positions

    n_dev = int(np.prod(list(mesh.shape.values())))
    positions = window_positions(starts, k1)
    n = len(positions)
    w = kmerops.words_per_kmer(k1)
    if n == 0:
        empty = (np.zeros((0, w), np.uint32), np.zeros(0, np.int32))
        return empty + (np.zeros((0, w), np.uint32),) if return_rare \
            else empty

    # pad position count to a multiple of n_dev
    npad = -(-n // n_dev) * n_dev
    pos = np.zeros(npad, dtype=np.int32)
    pos[:n] = positions
    val = np.zeros(npad, dtype=bool)
    val[:n] = True

    from .multihost import fetch_global, put_global

    pool = as_pool(flat_codes)
    packed = put_global(pool.window_padded(0, pool.n_words), mesh, P())
    posd = put_global(pos, mesh, P(axis))
    vald = put_global(val, mesh, P(axis))

    step = make_sharded_counter(mesh, k1, axis)
    skeys, counts, head, n_over = step(packed, posd, vald)
    if int(fetch_global(n_over)[0]) != 0:
        # hash-skewed input overflowed the 2x capacity; retry at the
        # guaranteed capacity (a whole source shard per destination)
        step = make_sharded_counter(mesh, k1, axis,
                                    capacity_factor=float(n_dev))
        skeys, counts, head, n_over = step(packed, posd, vald)
    assert int(fetch_global(n_over)[0]) == 0, (
        "all_to_all overflow at guaranteed capacity (bug)"
    )
    skeys = fetch_global(skeys)
    counts = fetch_global(counts)
    head = fetch_global(head)
    keep = head & (counts >= min_count)
    out_keys = skeys[keep]
    # clamp to the reference's kMaxMul, as the single-device counter does
    from ..graph.counter import KMAX_MUL

    out_counts = np.minimum(counts[keep], KMAX_MUL).astype(np.int32)
    order = np.lexsort(tuple(out_keys[:, i] for i in range(w - 1, -1, -1)))
    if not return_rare:
        return out_keys[order], out_counts[order]
    rare = skeys[head & (counts < min_count)]
    rorder = np.lexsort(tuple(rare[:, i] for i in range(w - 1, -1, -1)))
    return out_keys[order], out_counts[order], rare[rorder]
