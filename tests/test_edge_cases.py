"""Reference simple_test scenario analogues: empty input, inputs
yielding no contigs, high-k multiword path, SdBG persistence,
histogram stats (reference CMakeLists.txt:104-116 matrix)."""

import gzip
import os

import numpy as np
import pytest

from megahit_tpu.__main__ import main
from megahit_tpu.core import packing
from megahit_tpu.graph.sdbg import Sdbg, sdbg_from_edges
from megahit_tpu.graph import counter
from megahit_tpu.graph.unitig import build_unitig_graph
from megahit_tpu.graph.output import unitig_codes
from megahit_tpu.utils.histogram import Histogram

RNG = np.random.default_rng(88)


def test_empty_input(tmp_path):
    p = tmp_path / "empty.fa"
    p.write_text("")
    out = str(tmp_path / "out")
    rc = main(["-r", str(p), "-o", out, "--k-list", "21,29",
               "--no-local"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "done"))
    from megahit_tpu.io.contig_io import read_contigs

    assert read_contigs(os.path.join(out, "final.contigs.fa")) == []


def test_input_yielding_no_contigs(tmp_path):
    # reads shorter than k+1 produce no solid edges at all
    p = tmp_path / "short.fa"
    with open(p, "w") as fh:
        for i in range(50):
            s = packing.decode(RNG.integers(0, 4, 15).astype(np.uint8))
            fh.write(f">r{i}\n{s}\n")
    out = str(tmp_path / "out")
    rc = main(["-r", str(p), "-o", out, "--k-list", "21", "--no-local"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "done"))


def test_high_k_multiword_assembly(tmp_path):
    # k=141 -> edge length 142 -> 9 uint32 words per key
    genome = RNG.integers(0, 4, size=1200).astype(np.uint8)
    p = tmp_path / "r.fa.gz"
    with gzip.open(p, "wt") as fh:
        for i, s in enumerate(range(0, 1000, 1)):
            fh.write(f">r{i}\n{packing.decode(genome[s:s+200])}\n")
    out = str(tmp_path / "out")
    rc = main(["-r", str(p), "-o", out, "--k-list", "141", "--no-local",
               "--keep-tmp-files"])
    assert rc == 0
    from megahit_tpu.io.contig_io import read_contigs

    finals = read_contigs(os.path.join(out, "final.contigs.fa"))
    assert len(finals) == 1
    s = packing.decode(finals[0].codes)
    g = packing.decode(genome)
    rcs = packing.decode(packing.revcomp_codes(finals[0].codes))
    assert s in g or rcs in g
    assert finals[0].length > 1000


def test_sdbg_save_load_roundtrip(tmp_path):
    reads = [RNG.integers(0, 4, 80).astype(np.uint8) for _ in range(40)]
    flat, starts = packing.pack_many(reads)
    keys, counts = counter.count_canonical_kmers(flat, starts, 22, 1)
    s = sdbg_from_edges(keys, counts, 22)
    s.valid[:5] = False
    path = str(tmp_path / "g.sdbg.npz")
    s.save(path)
    s2 = Sdbg.load(path)
    assert s2.k == s.k
    np.testing.assert_array_equal(s2.keys, s.keys)
    np.testing.assert_array_equal(s2.valid, s.valid)
    g1 = build_unitig_graph(s)
    g2 = build_unitig_graph(s2)
    assert g1.size == g2.size


def test_histogram_stats():
    h = Histogram([1, 2, 2, 3, 3, 3, 10])
    assert h.size == 7
    assert h.median() == 3
    assert h.maximum() == 10
    assert h.nx(h.sum() / 2) == 3
    h2 = Histogram([5, 5, 1, 1, 1, 9])
    h2.trim_low(2)
    assert h2.size == 3
    hist = Histogram(
        np.concatenate([np.full(50, 1), np.full(5, 2), np.full(30, 5)])
    )
    # counts by value: 1->50, 2->5, 5->30; first local min at 2
    assert hist.first_local_minimum() == 2


def test_prune_level_3(tmp_path):
    """Reference simple_test runs --prune-level 3 --prune-depth 0
    (CMakeLists.txt:108); exercises the RemoveLowDepth + re-bubble
    branch of the cleaning loop."""
    import gzip

    genome = RNG.integers(0, 4, size=2000).astype(np.uint8)
    p = tmp_path / "r.fa.gz"
    with gzip.open(p, "wt") as fh:
        for i in range(0, 1900, 2):
            fh.write(f">r{i}\n{packing.decode(genome[i:i+100])}\n")
    out = str(tmp_path / "out")
    rc = main(["-r", str(p), "-o", out, "--k-list", "21,41",
               "--no-local", "--prune-level", "3", "--prune-depth", "0",
               "--min-contig-len", "500"])
    assert rc == 0
    from megahit_tpu.io.contig_io import read_contigs

    finals = read_contigs(os.path.join(out, "final.contigs.fa"))
    assert len(finals) == 1 and finals[0].length > 1800
