"""Property tests for packing and k-mer primitives against a plain-Python
reference model (strings), mirroring the role of the reference's
src/kmlib/test_kmbit.cpp / test_compactvector.cpp micro-tests."""

import numpy as np
import pytest

from megahit_tpu.core import kmerops, packing

RNG = np.random.default_rng(0)


def rand_codes(n):
    return RNG.integers(0, 4, size=n).astype(np.uint8)


def codes_to_str(codes):
    return packing.decode(codes)


# ---------------------------------------------------------------- packing


def test_encode_decode_roundtrip():
    s = "ACGTACGTNNacgtn"
    codes = packing.encode(s)
    assert codes_to_str(codes) == "ACGTACGTGGACGTG"  # N -> G like reference


@pytest.mark.parametrize("n", [1, 15, 16, 17, 33, 100])
def test_pack_unpack_roundtrip(n):
    codes = rand_codes(n)
    words = packing.pack_codes(codes)
    assert words.dtype == np.uint32
    assert len(words) == (n + 15) // 16
    out = packing.unpack_words(words, n)
    np.testing.assert_array_equal(out, codes)


def test_pack_is_lexicographic():
    # numeric order of word arrays == lexicographic order of base strings
    for _ in range(200):
        n = int(RNG.integers(1, 40))
        a, b = rand_codes(n), rand_codes(n)
        wa, wb = packing.pack_codes(a), packing.pack_codes(b)
        assert (tuple(wa) < tuple(wb)) == (list(a) < list(b))


# ---------------------------------------------------------------- extraction


@pytest.mark.parametrize("k", [5, 15, 16, 17, 21, 31, 33, 45])
def test_extract_kmers(k):
    n = 200
    codes = rand_codes(n)
    pad = (-n) % 16
    flat = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
    packed = np.asarray(kmerops.pack_flat_codes(flat))

    positions = np.arange(0, n - k + 1, dtype=np.int32)
    keys = np.asarray(kmerops.extract_kmers(packed, positions, k))
    for i in [0, 1, 7, len(positions) - 1]:
        expect = packing.pack_codes(codes[i : i + k])
        np.testing.assert_array_equal(keys[i], expect, err_msg=f"pos {i}")


@pytest.mark.parametrize("k", [5, 16, 21, 31, 33])
def test_revcomp(k):
    n = 50
    codes = rand_codes(n)
    positions = np.arange(0, n - k + 1, dtype=np.int32)
    pad = (-n) % 16
    flat = np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
    packed = np.asarray(kmerops.pack_flat_codes(flat))
    keys = kmerops.extract_kmers(packed, positions, k)
    rc = np.asarray(kmerops.revcomp_kmers(keys, k))
    for i in range(len(positions)):
        expect = packing.pack_codes(packing.revcomp_codes(codes[i : i + k]))
        np.testing.assert_array_equal(rc[i], expect)
    # involution
    rc2 = np.asarray(kmerops.revcomp_kmers(rc, k))
    np.testing.assert_array_equal(rc2, np.asarray(keys))


def test_canonical_matches_reference_rule():
    k = 21
    n = 300
    codes = rand_codes(n)
    pad = (-n) % 16
    packed = np.asarray(
        kmerops.pack_flat_codes(
            np.concatenate([codes, np.zeros(pad, dtype=np.uint8)])
        )
    )
    positions = np.arange(0, n - k + 1, dtype=np.int32)
    keys = kmerops.extract_kmers(packed, positions, k)
    canon, is_rc = kmerops.canonical_kmers(keys, k)
    canon, is_rc = np.asarray(canon), np.asarray(is_rc)
    for i in range(len(positions)):
        s = codes[i : i + k]
        r = packing.revcomp_codes(s)
        expect = min(list(s), list(r))
        np.testing.assert_array_equal(
            canon[i], packing.pack_codes(np.array(expect, dtype=np.uint8))
        )
        assert is_rc[i] == (list(r) < list(s))


# ---------------------------------------------------------------- surgery


def test_base_surgery():
    k = 21
    codes = rand_codes(k)
    key = packing.pack_codes(codes)[None, :]
    import jax.numpy as jnp

    key = jnp.asarray(key)
    for i in [0, 7, 15, 16, 20]:
        assert int(kmerops.get_base(key, i)[0]) == codes[i]
    # drop_first_base == codes[1:] + [0]
    dropped = np.asarray(kmerops.drop_first_base(key, k))[0]
    expect = packing.pack_codes(
        np.concatenate([codes[1:], np.zeros(1, dtype=np.uint8)])
    )
    np.testing.assert_array_equal(dropped, expect)
    # prepend_base(c) == [c] + codes[:-1]
    pre = np.asarray(kmerops.prepend_base(key, 3, k))[0]
    expect = packing.pack_codes(
        np.concatenate([np.array([3], dtype=np.uint8), codes[:-1]])
    )
    np.testing.assert_array_equal(pre, expect)
    # set_base
    sb = np.asarray(kmerops.set_base(key, 16, 1))[0]
    mod = codes.copy()
    mod[16] = 1
    np.testing.assert_array_equal(sb, packing.pack_codes(mod))


# ---------------------------------------------------------------- sort/search


@pytest.mark.parametrize("k", [11, 21, 33])
def test_sort_and_search(k):
    import jax.numpy as jnp

    n = 500
    w = kmerops.words_per_kmer(k)
    keys = np.stack(
        [packing.pack_codes(rand_codes(k)) for _ in range(n)]
    ).astype(np.uint32)
    payload = np.arange(n, dtype=np.int32)
    skeys, spay = kmerops.sort_keys_with_payload(
        jnp.asarray(keys), jnp.asarray(payload)
    )
    skeys, spay = np.asarray(skeys), np.asarray(spay)
    order = sorted(range(n), key=lambda i: tuple(keys[i]))
    np.testing.assert_array_equal(skeys, keys[order])
    np.testing.assert_array_equal(spay, payload[order])

    # search every key finds itself
    idx, found = kmerops.searchsorted_keys(jnp.asarray(skeys), jnp.asarray(keys))
    idx, found = np.asarray(idx), np.asarray(found)
    assert found.all()
    np.testing.assert_array_equal(skeys[idx], keys)

    # absent queries
    queries = np.stack(
        [packing.pack_codes(rand_codes(k)) for _ in range(100)]
    ).astype(np.uint32)
    idx, found = kmerops.searchsorted_keys(
        jnp.asarray(skeys), jnp.asarray(queries)
    )
    present = {tuple(r) for r in skeys}
    for i, q in enumerate(queries):
        assert bool(found[i]) == (tuple(q) in present)
