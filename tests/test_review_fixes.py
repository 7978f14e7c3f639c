"""Regressions for the round-1 code-review findings."""

import io

import jax
import numpy as np
from jax.sharding import Mesh

from megahit_tpu.core import packing
from megahit_tpu.graph import counter
from megahit_tpu.graph.cleaning import _banded_similarity
from megahit_tpu.graph.mercy import find_mercy_edges
from megahit_tpu.parallel.shuffle import sharded_count_kmers

RNG = np.random.default_rng(3131)


def test_banded_similarity_carries_dp_rows():
    # identical strings
    assert _banded_similarity("ACGTACGTACGT", "ACGTACGTACGT", 0.5) == 1.0
    # completely different same-length strings must NOT look similar
    a = "ACGT" * 10
    b = "TGCA" * 10
    assert _banded_similarity(a, b, 0.5) < 0.6
    # one substitution
    c = list(a)
    c[5] = "A" if a[5] != "A" else "C"
    sim = _banded_similarity(a, "".join(c), 0.5)
    assert abs(sim - (1 - 1 / 40)) < 1e-9
    # one insertion
    sim = _banded_similarity(a, a[:7] + "G" + a[7:], 0.5)
    assert abs(sim - (1 - 1 / 41)) < 1e-9


def test_counter_misaligned_batch_windows():
    reads = [RNG.integers(0, 4, size=int(L)).astype(np.uint8)
             for L in RNG.integers(40, 150, 400)]
    flat, starts = packing.pack_many(reads)
    ref_k, ref_c = counter.count_canonical_kmers(flat, starts, 22, 1)
    # a batch size that is NOT a multiple of 16 (e.g. from -m budgets)
    got_k, got_c = counter.count_canonical_kmers(
        flat, starts, 22, 1, batch_windows=100003
    )
    np.testing.assert_array_equal(ref_k, got_k)
    np.testing.assert_array_equal(ref_c, got_c)


def test_fastq_interior_blank_line():
    from megahit_tpu.io.fastx import _iter_fastx_stream

    data = b"@r1\nACGT\n+\nIIII\n\n@r2\nGGGG\n+\nIIII\n"
    recs = list(_iter_fastx_stream(
        io.BufferedReader(io.BytesIO(data))
    ))
    assert [r.name for r in recs] == ["r1", "r2"]
    assert recs[1].seq == b"GGGG"


def test_mesh_count_all_ones_kmer():
    # k1 = 32: the canonical form of T^32 is A^32 (all-zero key), but a
    # NON-canonical all-ones key can't arise; craft instead k-mers that
    # pack to all-ones on one word boundary and verify mesh == local.
    # Also include a poly-T read: its canonical 32-mers must count.
    reads = [np.full(64, 3, np.uint8)] + [
        RNG.integers(0, 4, 64).astype(np.uint8) for _ in range(20)
    ]
    flat, starts = packing.pack_many(reads)
    ref_k, ref_c = counter.count_canonical_kmers(flat, starts, 32, 1)
    mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
    got_k, got_c = sharded_count_kmers(flat, starts, 32, 1, mesh)
    np.testing.assert_array_equal(ref_k, got_k)
    np.testing.assert_array_equal(ref_c, got_c)


def test_mercy_skips_reads_of_exactly_k_plus_1():
    # a read of exactly k+1 bases must never donate mercy edges
    # (reference seq_to_sdbg.cpp:202)
    k1 = 22
    genome = RNG.integers(0, 4, 300).astype(np.uint8)
    reads = [genome[i : i + 80].copy() for i in range(0, 200, 40)]
    flat, starts = packing.pack_many(reads)
    keys, _ = counter.count_canonical_kmers(flat, starts, k1, 2)
    short = [genome[10 : 10 + k1].copy()]  # exactly k+1 bases
    f2, s2 = packing.pack_many(reads + short)
    m_with = find_mercy_edges(f2, s2, keys, k1)
    m_without = find_mercy_edges(flat, starts, keys, k1)
    np.testing.assert_array_equal(m_with, m_without)
