"""Local assembly: mapper correctness + end-to-end gap filling."""

import numpy as np

from megahit_tpu.core import packing
from megahit_tpu.io.contig_io import ContigRecord
from megahit_tpu.io.lib import SequenceLib
from megahit_tpu.localasm.local_assemble import run_local_assembly
from megahit_tpu.localasm.mapper import build_seed_index, map_reads
from megahit_tpu.localasm.mini_asm import mini_assemble

RNG = np.random.default_rng(77)


def test_mapper_exact_reads():
    genome = RNG.integers(0, 4, size=2000).astype(np.uint8)
    contigs = [genome[:1000].copy(), genome[1000:].copy()]
    index = build_seed_index(contigs)
    reads, want = [], []
    for s in range(0, 1900, 37):
        r = genome[s : s + 100]
        cid = 0 if s + 100 <= 1000 else (1 if s >= 1000 else None)
        if RNG.random() < 0.5:
            reads.append(packing.revcomp_codes(r))
            want.append((cid, 1))
        else:
            reads.append(r.copy())
            want.append((cid, 0))
    flat, starts = packing.pack_many(reads)
    res = map_reads(flat, starts, index)
    for i, (cid, strand) in enumerate(want):
        if cid is None:
            continue  # straddles the contig boundary; clipped or unmapped
        assert res.valid[i], i
        assert res.contig_id[i] == cid
        assert res.strand[i] == strand
        assert res.mismatch[i] == 0
        # full-length alignment
        assert res.query_from[i] == 0 and res.query_to[i] == 99


def test_mapper_mismatches_counted():
    genome = RNG.integers(0, 4, size=1200).astype(np.uint8)
    index = build_seed_index([genome.copy()])
    r = genome[200:300].copy()
    r[10] = (r[10] + 1) % 4
    r[90] = (r[90] + 2) % 4
    flat, starts = packing.pack_many([r])
    res = map_reads(flat, starts, index)
    assert res.valid[0] and res.mismatch[0] == 2


def test_mini_assemble_single_group():
    genome = RNG.integers(0, 4, size=500).astype(np.uint8)
    reads = [genome[i : i + 100].copy() for i in range(0, 400, 4)]
    end = genome[:100].copy()
    out = mini_assemble([reads], [end], mink=11, maxk=41, step=6)
    assert len(out[0]) >= 1
    best = max(out[0], key=len)
    s = packing.decode(best)
    rc = packing.decode(packing.revcomp_codes(best))
    g = packing.decode(genome)
    assert len(best) > 400
    assert s in g or rc in g


def test_local_assembly_fills_gap():
    genome = RNG.integers(0, 4, size=1500).astype(np.uint8)
    c1, c2 = genome[:600].copy(), genome[900:].copy()
    contigs = [ContigRecord(c1, 21, 0, 0, 10.0),
               ContigRecord(c2, 21, 1, 0, 10.0)]
    insert, rl = 300, 100
    seqs = []
    for s in range(0, len(genome) - insert + 1, 2):
        frag = genome[s : s + insert]
        seqs.append(frag[:rl].copy())
        seqs.append(packing.revcomp_codes(frag[-rl:]))
    flat, starts = packing.pack_many(seqs)
    lib = SequenceLib(flat, starts, [(0, len(seqs), True)])
    out = run_local_assembly(lib, contigs, local_kmax=41)
    assert out, "expected local contigs"
    g = packing.decode(genome)
    covered_gap = False
    for c in out:
        s = packing.decode(c.codes)
        rc = packing.decode(packing.revcomp_codes(c.codes))
        m = s if s in g else (rc if rc in g else None)
        assert m is not None, "local contig must match the genome"
        pos = g.find(m)
        if pos < 900 and pos + len(m) > 600:
            covered_gap = True
    assert covered_gap, "local contigs must reach into the gap"


def test_mini_assemble_large_k_rungs():
    """Local rungs run k = 11..min(next_k, read_len) step 6, so high
    ladders reach k >= 65: the 128-bit (hi, lo) keying silently
    overflowed there (numpy u64 shifts wrap at 64) until round 4's
    u64-column keys. Error-free 200 bp reads at maxk=131 must
    reassemble the genome segment through rungs 65..131."""
    rng = np.random.default_rng(77)
    genome = rng.integers(0, 4, 900).astype(np.uint8)
    reads = [genome[s: s + 200].copy()
             for s in range(0, len(genome) - 200, 9)]
    out = mini_assemble([reads], [genome[:250].copy()],
                        mink=11, maxk=131, step=6)
    assert len(out[0]) >= 1
    joined = [packing.decode(c) for c in out[0]]
    g = packing.decode(genome)
    grc = packing.decode(packing.revcomp_codes(genome))
    best = max(len(c) for c in joined)
    assert best >= 700, best  # one long contig spanning most reads
    for c in joined:
        if len(c) >= 131:
            assert c in g or c in grc, "contig not a genome substring"
