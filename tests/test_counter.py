"""Counter vs brute force and vs the reference oracle's solid edges."""

from collections import Counter

import numpy as np
import pytest

from megahit_tpu.core import packing
from megahit_tpu.graph import counter
from megahit_tpu.io.lib import build_lib

import oracle

RNG = np.random.default_rng(7)


def brute_force_count(seqs, k):
    c = Counter()
    for s in seqs:
        text = packing.decode(s)
        for i in range(len(text) - k + 1):
            w = text[i : i + k]
            r = packing.decode(packing.revcomp_codes(packing.encode(w)))
            c[min(w, r)] += 1
    return c


def test_counter_vs_bruteforce():
    k1 = 11
    seqs = [RNG.integers(0, 4, size=int(n)).astype(np.uint8)
            for n in RNG.integers(5, 60, size=50)]
    flat, starts = packing.pack_many(seqs)
    keys, counts = counter.count_canonical_kmers(flat, starts, k1, 1)
    expect = brute_force_count(seqs, k1)
    got = {}
    for row, c in zip(keys, counts):
        got[packing.decode(packing.unpack_words(row, k1))] = int(c)
    assert got == dict(expect)


def test_counter_min_count_filter():
    k1 = 7
    seqs = [packing.encode("ACGTACGTAC"), packing.encode("ACGTACGTAC"),
            packing.encode("TTTTTTTTTT")]
    flat, starts = packing.pack_many(seqs)
    keys, counts = counter.count_canonical_kmers(flat, starts, k1, 2)
    expect = {k: v for k, v in brute_force_count(seqs, k1).items() if v >= 2}
    got = {packing.decode(packing.unpack_words(row, k1)): int(c)
           for row, c in zip(keys, counts)}
    assert got == expect


@pytest.mark.oracle
def test_counter_matches_reference_solid_edges():
    """Canonical (k+1)-mer classes and counts must equal the reference
    `count` subprogram's solid edge output on the bundled test data."""
    out = oracle.ensure_test_run()
    if out is None:
        pytest.skip("reference oracle unavailable")
    ref_codes, ref_mult, k = oracle.read_edge_file(out / "tmp/k21/21")
    k1 = k + 1

    td = oracle.TEST_DATA
    lib = build_lib(
        pe1=[str(td / "r3_1.fa")],
        pe2=[str(td / "r3_2.fa")],
        pe12=[str(td / "r1.il.fa.gz"), str(td / "r2.il.fa.bz2")],
        se=[str(td / "r4.fa"), str(td / "loop.fa")],
    )
    keys, counts = counter.count_canonical_kmers(
        lib.flat_codes, lib.starts, k1, 2
    )

    def canon_str(codes):
        w = packing.decode(codes)
        r = packing.decode(packing.revcomp_codes(codes))
        return min(w, r)

    # reference packs reads reversed; un-reverse its edges, re-canonicalize
    ref = {}
    for row, m in zip(ref_codes, ref_mult):
        ref[canon_str(row[::-1])] = int(m)
    mine = {}
    for row, c in zip(keys, counts):
        mine[canon_str(packing.unpack_words(row, k1))] = int(c)

    assert len(mine) == len(ref)
    assert mine == ref
