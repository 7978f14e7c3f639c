"""Device k-mer primitives: multi-word keys as (N, W) uint32 arrays.

A k-mer key is ``W = ceil(k/16)`` uint32 words, 2-bit big-endian packed,
left-aligned (trailing bits of the last word are zero). Lexicographic
order over bases == lexicographic order over the word tuple, so sorts
and binary searches over (N, W) arrays compare words most-significant
first.

Everything here is static-shape jnp code that works identically on TPU
and CPU. These are the TPU-native replacements for the reference's
Kmer<NWords,TWord> (src/sequence/kmer.h) and copy_substr.h: instead of
per-item shift loops, whole-batch funnel-shift gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BASES_PER_WORD = 16
# numpy scalar, NOT jnp: a jnp.uint32 scalar hijacks numpy-array
# operands into device arrays, silently defeating the dual-backend
# (numpy in -> numpy out) contract of the key-surgery helpers; an
# np.uint32 scalar stays numpy with numpy and becomes a constant
# under jit with jax arrays.
U32 = np.uint32


def words_per_kmer(k: int) -> int:
    return (k + BASES_PER_WORD - 1) // BASES_PER_WORD


# ---------------------------------------------------------------------------
# packing a flat code array on device
# ---------------------------------------------------------------------------


def pack_flat_codes(codes: jnp.ndarray) -> jnp.ndarray:
    """uint8/int32 codes (B,) -> packed uint32 (ceil(B/16),), big-endian.

    B must be a multiple of 16 (pad on host).
    """
    b = codes.shape[0]
    assert b % BASES_PER_WORD == 0, "pad flat codes to a multiple of 16"
    c = codes.astype(U32).reshape(b // BASES_PER_WORD, BASES_PER_WORD)
    shifts = (30 - 2 * jnp.arange(BASES_PER_WORD, dtype=U32)).astype(U32)
    return jnp.bitwise_or.reduce(c << shifts, axis=1)


# ---------------------------------------------------------------------------
# k-mer extraction by funnel shift
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k",))
def extract_kmers(packed: jnp.ndarray, positions: jnp.ndarray, k: int) -> jnp.ndarray:
    """Gather k-mers starting at base offsets `positions` from a packed array.

    packed: (P,) uint32, 16 bases/word big-endian (the flat sequence pool).
    positions: (N,) int32 base offsets into the flat pool.
    returns: (N, W) uint32 left-aligned k-mer keys.

    Replaces reference CopySubstring (src/sequence/copy_substr.h:53-178):
    each output word is a funnel shift of two gathered input words, fully
    vectorized over N.
    """
    w = words_per_kmer(k)
    word0 = (positions // BASES_PER_WORD).astype(jnp.int32)  # (N,)
    bitoff = ((positions % BASES_PER_WORD) * 2).astype(U32)  # (N,) in [0,30]
    n = positions.shape[0]
    p = packed.shape[0]

    # gather words word0 + i and word0 + i + 1 for i in [0, w)
    idx = word0[:, None] + jnp.arange(w + 1, dtype=jnp.int32)[None, :]  # (N, w+1)
    idx = jnp.minimum(idx, p - 1)
    words = packed[idx]  # (N, w+1) uint32

    lo = words[:, :w] << bitoff[:, None]
    # shift by 32 is undefined; when bitoff == 0 the high part must be 0.
    hi = jnp.where(
        bitoff[:, None] == 0,
        jnp.zeros((n, w), dtype=U32),
        words[:, 1 : w + 1] >> (U32(32) - bitoff[:, None]),
    )
    out = lo | hi
    return mask_tail(out, k)


@functools.partial(jax.jit, static_argnames=("k",))
def extract_all_kmers(packed: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-mer keys at EVERY base offset of a packed pool - gather-free.

    packed: (P,) uint32. Returns ((P - W) * 16, W) keys where row p is
    the k-mer starting at base offset p. Rows whose window crosses a
    sequence boundary are garbage; callers mask them out with a validity
    mask computed from the start-offset table.

    This is the hot-path replacement for extract_kmers when positions
    are dense (they always are in counting: every window of every read):
    a random gather of (N, W+1) words costs ~10x more on TPU than these
    static slices + 16 shift variants, which stream through the VPU.
    """
    w = words_per_kmer(k)
    p = packed.shape[0]
    q = p - w
    assert q > 0, "packed pool shorter than one k-mer"
    cols = [jax.lax.dynamic_slice_in_dim(packed, j, q) for j in range(w + 1)]
    a = jnp.stack(cols, axis=1)  # (q, w+1)
    lo = a[:, :w]
    hi = a[:, 1:]
    variants = [lo] + [
        (lo << U32(2 * r)) | (hi >> U32(32 - 2 * r)) for r in range(1, 16)
    ]
    keys = jnp.stack(variants, axis=1).reshape(q * 16, w)
    return mask_tail(keys, k)


def _xp(a):
    """numpy or jax.numpy, by argument type: the key-surgery helpers
    below are written once and run on host (numpy in, numpy out - the
    CPU-backend fast path) or on device (jax arrays / tracers)."""
    return jnp if isinstance(a, jax.Array) else np


def mask_tail(keys: jnp.ndarray, k: int) -> jnp.ndarray:
    """Zero the unused low bits of the last word."""
    xp = _xp(keys)
    w = keys.shape[-1]
    used = k - (w - 1) * BASES_PER_WORD  # bases in last word, in [1,16]
    if used == BASES_PER_WORD:
        return keys
    mask = U32(0xFFFFFFFF) << U32(32 - 2 * used)
    if isinstance(keys, np.ndarray):
        # one memcpy + in-place AND on the last column - the
        # concatenate path below writes every word twice
        out = keys.copy()
        out[..., -1] &= mask
        return out
    return xp.concatenate(
        [keys[..., :-1], keys[..., -1:] & mask], axis=-1
    )


# ---------------------------------------------------------------------------
# reverse complement / canonical
# ---------------------------------------------------------------------------


def _reverse_bases_in_word(x: jnp.ndarray) -> jnp.ndarray:
    """Reverse the 16 2-bit groups within each uint32 (vectorized).

    Host fast path: per-byte LUT + byte reversal (one gather + one
    strided copy, ~4x the shift-mask ladder; see _REV2_LUT below)."""
    if isinstance(x, np.ndarray):
        b = _REV2_LUT[np.ascontiguousarray(x).view(np.uint8)]
        return np.ascontiguousarray(
            b.reshape(-1, 4)[:, ::-1]
        ).view(np.uint32).reshape(x.shape)
    x = ((x & U32(0x33333333)) << U32(2)) | ((x & U32(0xCCCCCCCC)) >> U32(2))
    x = ((x & U32(0x0F0F0F0F)) << U32(4)) | ((x & U32(0xF0F0F0F0)) >> U32(4))
    x = ((x & U32(0x00FF00FF)) << U32(8)) | ((x & U32(0xFF00FF00)) >> U32(8))
    x = (x << U32(16)) | (x >> U32(16))
    return x


def shift_left_bits(keys: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """Left-shift a (N, W) multi-word key by nbits (< 32), cross-word."""
    if nbits == 0:
        return keys
    nb = U32(nbits)
    if isinstance(keys, np.ndarray):
        out = keys << nb
        np.bitwise_or(out[..., :-1], keys[..., 1:] >> (U32(32) - nb),
                      out=out[..., :-1])
        return out
    xp = _xp(keys)
    hi = keys << nb
    lo_src = xp.concatenate(
        [keys[..., 1:], xp.zeros_like(keys[..., :1])], axis=-1
    )
    return hi | (lo_src >> (U32(32) - nb))


def revcomp_kmers(keys: jnp.ndarray, k: int) -> jnp.ndarray:
    """(N, W) -> reverse complement, same layout.

    Complement = bitwise NOT (since rc(base) = 3 - base = ~base in 2 bits),
    reversal = per-word 2-bit-group reversal + word-order reversal + global
    left shift to restore left alignment. Large host inputs go through
    the native per-row transform (one pass instead of ~5 numpy passes).
    """
    if (isinstance(keys, np.ndarray) and keys.ndim == 2
            and len(keys) >= (1 << 14)):
        from ..native import OP_REVCOMP, transform_rows

        out = transform_rows(keys, k, OP_REVCOMP)
        if out is not None:
            return out
    w = keys.shape[-1]
    comp = ~keys
    rev = _reverse_bases_in_word(comp)[..., ::-1]  # (N, W), right-aligned k bases
    pad_bases = w * BASES_PER_WORD - k
    out = shift_left_bits(rev, 2 * pad_bases) if pad_bases else rev
    return mask_tail(out, k)


def ref_order_keys(keys: jnp.ndarray, k: int) -> jnp.ndarray:
    """(N, W) edge keys -> keys whose LEXICOGRAPHIC order equals the
    reference's SdBG edge-id order.

    The reference stores BOSS rows sorted colexicographically by the
    SOURCE node (the first k-1 chars REVERSED), tie-broken by the
    outgoing char W (= the edge's last char): verified empirically
    against a GetLabel dump of a reference .sdbg file (sdbg.h:214-231
    Backward reconstruction; seq_to_sdbg.cpp:630-700 item emission).
    Output layout: reverse(chars[0..k-2]) ++ chars[k-1], left-aligned.
    """
    if (isinstance(keys, np.ndarray) and keys.ndim == 2
            and len(keys) >= (1 << 14)):
        from ..native import OP_REF_ORDER, transform_rows

        out = transform_rows(keys, k, OP_REF_ORDER)
        if out is not None:
            return out
    xp = _xp(keys)
    node = mask_tail(keys, k - 1)
    # pure base reversal = complement of the reverse complement
    rev_node = mask_tail(~revcomp_kmers(node, k - 1), k - 1)
    last = get_base(keys, k - 1).astype(U32)
    widx = (k - 1) // BASES_PER_WORD
    sh = U32(30 - 2 * ((k - 1) % BASES_PER_WORD))
    col = (rev_node[..., widx] | (last << sh))[..., None]
    out = xp.concatenate(
        [rev_node[..., :widx], col, rev_node[..., widx + 1:]], axis=-1
    )
    return mask_tail(out, k)


def lex_less(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, W) < (N, W) lexicographic, word-major. Returns (N,) bool."""
    xp = _xp(a)
    w = a.shape[-1]
    lt = xp.zeros(a.shape[:-1], dtype=bool)
    eq = xp.ones(a.shape[:-1], dtype=bool)
    for i in range(w):
        lt = lt | (eq & (a[..., i] < b[..., i]))
        eq = eq & (a[..., i] == b[..., i])
    return lt


def lex_eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _xp(a).all(a == b, axis=-1)


def canonical_kmers(
    keys: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (canonical keys, is_rc) where canonical = min(key, rc(key)).

    Matches reference strand choice `rev_edge.cmp(edge) < 0` in
    src/sorting/kmer_counter.cpp:137: the reverse complement is used only
    when strictly smaller.
    """
    xp = _xp(keys)
    rc = revcomp_kmers(keys, k)
    use_rc = lex_less(rc, keys)
    out = xp.where(use_rc[..., None], rc, keys)
    return out, use_rc


# ---------------------------------------------------------------------------
# single-base surgery on keys (for neighbour-candidate queries)
# ---------------------------------------------------------------------------


def get_base(keys: jnp.ndarray, i: int) -> jnp.ndarray:
    """Base at position i (static) of each key. Returns (N,) uint32 in [0,3]."""
    word = i // BASES_PER_WORD
    sh = U32(30 - 2 * (i % BASES_PER_WORD))
    return (keys[..., word] >> sh) & U32(3)


def set_base(keys: jnp.ndarray, i: int, c) -> jnp.ndarray:
    """Set base at static position i to c (scalar or (N,) array)."""
    xp = _xp(keys)
    word = i // BASES_PER_WORD
    sh = U32(30 - 2 * (i % BASES_PER_WORD))
    cleared = keys[..., word] & ~(U32(3) << sh)
    cval = (xp.asarray(c).astype(U32) & U32(3)) << sh
    col = (cleared | cval)[..., None]
    return xp.concatenate(
        [keys[..., :word], col, keys[..., word + 1:]], axis=-1
    )


def drop_first_base(keys: jnp.ndarray, k: int) -> jnp.ndarray:
    """keys[1:k] followed by a zero base: left shift by one base."""
    if (isinstance(keys, np.ndarray) and keys.ndim == 2
            and len(keys) >= (1 << 14)):
        from ..native import OP_DROP_FIRST, transform_rows

        out = transform_rows(keys, k, OP_DROP_FIRST)
        if out is not None:
            return out
    return mask_tail(shift_left_bits(keys, 2), k)


def shift_right_bits(keys: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """Right-shift a (N, W) multi-word key by nbits (< 32), cross-word."""
    if nbits == 0:
        return keys
    xp = _xp(keys)
    nb = U32(nbits)
    lo = keys >> nb
    hi_src = xp.concatenate(
        [xp.zeros_like(keys[..., :1]), keys[..., :-1]], axis=-1
    )
    return lo | (hi_src << (U32(32) - nb))


@functools.partial(jax.jit, static_argnames=("k",))
def prepend_base(keys: jnp.ndarray, c, k: int) -> jnp.ndarray:
    """c + keys[0:k-1]: right shift by one base, set base 0 to c."""
    out = shift_right_bits(keys, 2)
    out = set_base(out, 0, c)
    return mask_tail(out, k)


# ---------------------------------------------------------------------------
# sorting and searching multi-word keys
# ---------------------------------------------------------------------------


def sort_keys_with_payload(
    keys: jnp.ndarray, *payloads: jnp.ndarray
) -> tuple[jnp.ndarray, ...]:
    """Lexicographically sort (N, W) keys; payloads are permuted along.

    Returns (sorted_keys, *sorted_payloads). Uses lax.sort with W key
    operands (the TPU replacement for the reference's kmlib radix sort,
    src/kmlib/kmsort.h). Unstable: every consumer treats equal keys as
    an unordered group (count/dedup-max/unique), and the unstable
    lowering is ~40% faster on TPU.

    On the CPU backend the sort runs on host instead: XLA-CPU's
    comparator sort is single-threaded and several times slower than
    numpy's radix-ish argsort/lexsort for these widths.
    """
    w = keys.shape[-1]
    if jax.default_backend() == "cpu" and not isinstance(
            keys, jax.core.Tracer):
        kn = np.asarray(keys)
        order = argsort_rows_np(kn)
        return (kn[order],) + tuple(np.asarray(p)[order] for p in payloads)
    operands = tuple(keys[:, i] for i in range(w)) + tuple(payloads)
    out = jax.lax.sort(operands, num_keys=w, is_stable=False)
    sorted_keys = jnp.stack(out[:w], axis=-1)
    return (sorted_keys,) + tuple(out[w:])


def _scan_rows(n: int) -> int:
    """Largest power-of-two row count <= 4096 that divides n (for the
    two-level scan decomposition; 1-D scans lower poorly on TPU)."""
    rows = 1
    while rows < 4096 and n % (rows * 2) == 0:
        rows *= 2
    return rows


def cummin_reverse(x: jnp.ndarray) -> jnp.ndarray:
    """Reversed cumulative minimum of a 1-D int32 array, computed as a
    two-level (row-wise + carry) scan: ~2x faster than the 1-D lowering
    on TPU and unlocks VPU-shaped (rows, cols) tiles."""
    n = x.shape[0]
    rows = _scan_rows(n)
    if rows < 8:
        return jax.lax.cummin(x, axis=0, reverse=True)
    x2 = x.reshape(rows, -1)
    within = jax.lax.cummin(x2, axis=1, reverse=True)
    carry = jax.lax.cummin(within[:, 0], axis=0, reverse=True)
    carry = jnp.concatenate(
        [carry[1:], jnp.full((1,), jnp.iinfo(x.dtype).max, x.dtype)]
    )
    return jnp.minimum(within, carry[:, None]).reshape(-1)


def count_sorted_runs(
    skeys: jnp.ndarray, valid: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run-length count over lexicographically sorted (N, W) keys.

    valid marks real rows; invalid/padding rows MUST carry all-ones
    sentinel keys, which sort to the array tail. Returns (head, counts):
    head marks the first row of each run that contains at least one
    valid row; counts holds, on head rows, the number of valid rows in
    the run.

    Cost model: a segment_sum formulation is a 1-to-N scatter+gather
    that dominates the whole count step on TPU. Instead: counts = (next
    head index) - (own index) via one reversed cummin; the only run that
    can contain invalid rows is the final (sentinel-key) run, corrected
    with a scalar reduce - no gathers at all.
    """
    n = skeys.shape[0]
    prev = jnp.concatenate([skeys[:1], skeys[:-1]], axis=0)
    head = jnp.any(skeys != prev, axis=-1).at[0].set(True)
    idx = jnp.arange(n, dtype=jnp.int32)
    head_pos = jnp.where(head, idx, n)
    # next head strictly after i: reversed cummin, shifted left by one
    nh = cummin_reverse(head_pos)
    nh = jnp.concatenate([nh[1:], jnp.full((1,), n, jnp.int32)])
    counts = nh - idx
    n_inv = jnp.sum(~valid, dtype=jnp.int32)
    counts = jnp.where(nh == n, counts - n_inv, counts)
    counts = jnp.where(head, counts, 0)
    head = head & (counts > 0)
    return head, counts


def count_sorted_runs_soa(cols, valid):
    """count_sorted_runs over SoA columns (tuple of (N,) words).

    Identical semantics, but never materializes the (N, W) stacked
    layout - on TPU the stack costs a full extra HBM round trip of the
    key set, which matters in the count hot loop.
    """
    n = cols[0].shape[0]
    head = jnp.zeros(n, dtype=bool).at[0].set(True)
    for c in cols:
        prev = jnp.concatenate([c[:1], c[:-1]])
        head = head | (c != prev)
    idx = jnp.arange(n, dtype=jnp.int32)
    head_pos = jnp.where(head, idx, n)
    nh = cummin_reverse(head_pos)
    nh = jnp.concatenate([nh[1:], jnp.full((1,), n, jnp.int32)])
    counts = nh - idx
    n_inv = jnp.sum(~valid, dtype=jnp.int32)
    counts = jnp.where(nh == n, counts - n_inv, counts)
    counts = jnp.where(head, counts, 0)
    head = head & (counts > 0)
    return head, counts


def keys_to_u64_words(keys: np.ndarray) -> np.ndarray:
    """(N, 2) u32 -> u64 preserving lexicographic word order (host)."""
    return (keys[:, 0].astype(np.uint64) << np.uint64(32)) \
        | keys[:, 1].astype(np.uint64)


def pack_u64_columns(kn: np.ndarray) -> list[np.ndarray]:
    """(N, W) u32 -> ceil(W/2) u64 columns with identical lexicographic
    order (host). Halves the number of np.lexsort passes."""
    w = kn.shape[-1]
    cols = []
    for i in range(0, w - 1, 2):
        cols.append((kn[:, i].astype(np.uint64) << np.uint64(32))
                    | kn[:, i + 1].astype(np.uint64))
    if w % 2:
        cols.append(kn[:, w - 1].astype(np.uint64) << np.uint64(32))
    return cols


_REV2_LUT = np.array(
    [((b & 3) << 6) | (((b >> 2) & 3) << 4) | (((b >> 4) & 3) << 2)
     | (b >> 6) for b in range(256)], dtype=np.uint8)


def _reverse_bases_u64(x: np.ndarray) -> np.ndarray:
    """Reverse the 32 2-bit groups within each uint64 (host): per-byte
    LUT + byte reversal - ~4.7x faster than the shift-mask ladder."""
    b = _REV2_LUT[np.ascontiguousarray(x).view(np.uint8)]
    return np.ascontiguousarray(
        b.reshape(-1, 8)[:, ::-1]).view(np.uint64).ravel()


def ref_order_u64(keys: np.ndarray, k: int) -> np.ndarray:
    """Host fast path of ref_order_keys for k <= 32: the rotated key
    as ONE u64 per edge (left-aligned reverse(chars[0..k-2]) ++
    chars[k-1]), identical order to ref_order_keys' row output."""
    assert k <= 32
    c = np.uint64
    u = keys_to_u64_words(keys) if keys.shape[-1] == 2 \
        else keys[:, 0].astype(np.uint64) << c(32)
    node = u & (~c(0) << c(64 - 2 * (k - 1)))  # first k-1 bases
    rev = _reverse_bases_u64(node) << c(2 * (32 - (k - 1)))
    last = (u >> c(64 - 2 * k)) & c(3)
    return rev | (last << c(62 - 2 * (k - 1)))


def searchsorted_blocked_np(target, queries, tgt_top, q_top,
                            bits: int = 11) -> np.ndarray:
    """np.searchsorted(target, queries) for LARGE sorted targets:
    partition queries by the top `bits` of a u32 discriminant column
    (the keys' leading bases) so every per-bucket search probes a
    cache-resident target slice - binary search at 14M rows is DRAM-
    latency-bound otherwise (measured 3.4x at 14M x 16-byte rows).
    target/queries may be u64 scalars or void row views; tgt_top/q_top
    are their top-32-bit u32 columns."""
    n = len(target)
    if n < (1 << 21) or len(queries) < (1 << 18):
        return np.searchsorted(target, queries)
    nb = 1 << bits
    tb = (tgt_top >> np.uint32(32 - bits)).astype(np.int64)
    bounds = np.searchsorted(tb, np.arange(nb + 1))
    qb = (q_top >> np.uint32(32 - bits)).astype(np.uint16)
    order = np.argsort(qb, kind="stable")
    qs = queries[order]
    qcounts = np.bincount(qb, minlength=nb)
    out = np.empty(len(queries), np.int64)
    off = 0
    for b in np.nonzero(qcounts)[0]:
        c = int(qcounts[b])
        lo, hi = bounds[b], bounds[b + 1]
        out[order[off:off + c]] = lo + np.searchsorted(
            target[lo:hi], qs[off:off + c])
        off += c
    return out


def argsort_rows_np(kn: np.ndarray) -> np.ndarray:
    """Lexicographic argsort of (N, W) u32 rows on host (unstable
    between equal rows)."""
    w = kn.shape[-1]
    if len(kn) >= (1 << 16):
        from ..native import argsort_rows

        perm = argsort_rows(kn)
        if perm is not None:
            return perm
    if w == 1:
        return np.argsort(kn[:, 0])
    cols = pack_u64_columns(kn)
    if len(cols) == 1:
        return np.argsort(cols[0])
    return np.lexsort(tuple(reversed(cols)))


def keys_to_u64(keys: np.ndarray, k: int) -> np.ndarray:
    """(N, W) keys with k <= 32 -> uint64 preserving lexicographic
    order ((word0 << 32) | word1; word1 = 0 when W == 1).

    Unlocks host-side np.searchsorted (a tight C binary search) for
    membership tests - orders of magnitude cheaper than device
    binary search with random gathers when the query side is huge.
    """
    assert k <= 32, "u64 fast path requires k <= 32"
    keys = np.asarray(keys)
    hi = keys[:, 0].astype(np.uint64) << np.uint64(32)
    lo = keys[:, 1].astype(np.uint64) if keys.shape[1] > 1 else 0
    return hi | lo


def member_sorted_mt(table: np.ndarray, q: np.ndarray, pool=None
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Multi-threaded membership of q in a sorted 1-D table.

    Returns (idx, found). np.searchsorted releases the GIL, so
    splitting the query range across threads scales with host cores.
    Pass a ThreadPoolExecutor to amortize pool setup across calls.
    """
    n = len(q)
    idx = np.empty(n, dtype=np.int64)
    found = np.zeros(n, dtype=bool)
    if len(table) == 0 or n == 0:
        return idx[:n], found

    def one(sl):
        i = np.searchsorted(table, q[sl])
        return sl, i, table[np.minimum(i, len(table) - 1)] == q[sl]

    from ..utils.threads import num_threads

    parts = max(1, min(8, num_threads(), n // (1 << 18)))
    if parts == 1 or pool is None:
        sl = slice(0, n)
        _, idx[sl], found[sl] = one(sl)
        return idx, found
    step = -(-n // parts)
    for sl, i, f in pool.map(
        one, [slice(a, min(n, a + step)) for a in range(0, n, step)]
    ):
        idx[sl] = i
        found[sl] = f
    return idx, found


def searchsorted_keys(
    sorted_keys: jnp.ndarray, queries: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched multi-word binary search.

    sorted_keys: (E, W) lexicographically sorted.
    queries: (Q, W).
    Returns (idx, found): idx (Q,) int32 = index of exact match (or
    insertion point if absent), found (Q,) bool.

    This replaces the reference's IndexBinarySearch (src/sdbg/sdbg.h:141)
    which walks Backward() per probe; here it is a data-parallel fixed
    trip-count loop of multi-word compares.
    """
    e = sorted_keys.shape[0]
    q = queries.shape[0]
    steps = max(1, int(np.ceil(np.log2(max(e, 2)))) + 1)

    lo = jnp.zeros((q,), dtype=jnp.int32)
    hi = jnp.full((q,), e, dtype=jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        mid_keys = sorted_keys[jnp.minimum(mid, e - 1)]
        less = lex_less(mid_keys, queries)  # sorted[mid] < query
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    idx = lo
    safe = jnp.minimum(idx, e - 1)
    found = (idx < e) & lex_eq(sorted_keys[safe], queries)
    return idx.astype(jnp.int32), found
