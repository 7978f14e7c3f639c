"""End-to-end single-k assembly tests on synthetic genomes."""

import numpy as np
import pytest

from megahit_tpu.core import packing
from megahit_tpu.graph import counter
from megahit_tpu.graph.sdbg import build_sdbg
from megahit_tpu.graph.unitig import build_unitig_graph
from megahit_tpu.graph.output import unitig_codes
from megahit_tpu.pipeline.assemble import AssembleOptions, assemble

RNG = np.random.default_rng(42)


def simulate_reads(genome: np.ndarray, read_len=100, stride=4,
                   circular=False):
    reads = []
    g = genome
    if circular:
        g = np.concatenate([genome, genome[: read_len - 1]])
    for i in range(0, len(g) - read_len + 1, stride):
        r = g[i : i + read_len]
        if RNG.random() < 0.5:
            r = packing.revcomp_codes(r)
        reads.append(r.copy())
    return reads


def build_graph_from_reads(reads, k, min_count=1):
    flat, starts = packing.pack_many(reads)
    keys, counts = counter.count_canonical_kmers(flat, starts, k + 1,
                                                 min_count)
    # solid (k+1)-mers become the sequences feeding the graph
    seqs = [packing.unpack_words(row, k + 1) for row in keys]
    sflat, sstarts = packing.pack_many(seqs)
    return build_sdbg(sflat, sstarts, counts, k)


def canon_str(codes):
    a = packing.decode(codes)
    b = packing.decode(packing.revcomp_codes(codes))
    return min(a, b)


def test_linear_genome_single_unitig():
    k = 21
    genome = RNG.integers(0, 4, size=500).astype(np.uint8)
    sdbg = build_graph_from_reads(simulate_reads(genome), k)
    g = build_unitig_graph(sdbg)
    # a repeat-free genome yields exactly one unitig spanning it
    assert g.size == 1
    assert not g.is_loop[0]
    codes = unitig_codes(g, [0])[0]
    assert canon_str(codes) == canon_str(genome)


def test_circular_genome_loop_vertex():
    k = 21
    genome = RNG.integers(0, 4, size=400).astype(np.uint8)
    sdbg = build_graph_from_reads(
        simulate_reads(genome, circular=True), k
    )
    g = build_unitig_graph(sdbg)
    assert g.size == 1
    assert g.is_loop[0]
    # loop contains every genome k-mer once: length == genome length
    assert g.length[0] == len(genome)
    codes = unitig_codes(g, [0])[0]
    # the loop string is a rotation of the genome (k+len-1 bases)
    doubled = packing.decode(np.concatenate([genome, genome]))
    s = packing.decode(codes)
    rc = packing.decode(packing.revcomp_codes(codes))
    assert s in doubled or rc in doubled


def test_branching_genome_unitigs():
    # two genomes sharing a middle segment -> X structure
    k = 21
    shared = RNG.integers(0, 4, size=200).astype(np.uint8)
    a1 = RNG.integers(0, 4, size=200).astype(np.uint8)
    a2 = RNG.integers(0, 4, size=200).astype(np.uint8)
    b1 = RNG.integers(0, 4, size=200).astype(np.uint8)
    b2 = RNG.integers(0, 4, size=200).astype(np.uint8)
    g1 = np.concatenate([a1, shared, b1])
    g2 = np.concatenate([a2, shared, b2])
    reads = simulate_reads(g1) + simulate_reads(g2)
    sdbg = build_graph_from_reads(reads, k)
    g = build_unitig_graph(sdbg)
    # expect 5 unitigs: a1, a2, shared, b1, b2 (plus small variations at
    # junctions); at minimum the shared segment must appear
    strings = {canon_str(c) for c in unitig_codes(g).values()}
    assert any(canon_str(shared[k:-k]) in s or s in canon_str(shared)
               for s in strings) or g.size >= 5


def test_tip_removal_end_to_end():
    k = 21
    genome = RNG.integers(0, 4, size=600).astype(np.uint8)
    reads = simulate_reads(genome, stride=2)
    # add a tip: one erroneous read diverging mid-genome
    bad = genome[100:200].copy()
    bad[50:] = RNG.integers(0, 4, size=50)
    reads += [bad] * 2
    sdbg = build_graph_from_reads(reads, k)
    g0 = build_unitig_graph(sdbg)
    assert g0.size > 1  # tip creates branches
    res = assemble(sdbg, AssembleOptions(min_depth=0.0,
                                         prune_level=0, bubble_level=0))
    strings = [canon_str(c.codes) for c in res.contigs]
    assert canon_str(genome) in strings


def test_bubble_popping_end_to_end():
    k = 21
    genome = RNG.integers(0, 4, size=600).astype(np.uint8)
    variant = genome.copy()
    variant[300] = (variant[300] + 1) % 4  # SNP bubble
    reads = simulate_reads(genome, stride=2) + simulate_reads(
        variant, stride=8
    )
    sdbg = build_graph_from_reads(reads, k)
    res = assemble(sdbg, AssembleOptions(min_depth=0.0, prune_level=0))
    strings = [canon_str(c.codes) for c in res.contigs]
    # deeper branch (genome) wins, bubble popped -> single contig
    assert canon_str(genome) in strings
    assert len(strings) == 1


def test_sdbg_compact_save_load_roundtrip(tmp_path):
    """Compact at-rest format (canonical half + u16 mult + bitpacked
    valid, VERDICT round-1 item 6): round-trips keys/mult/valid and
    re-derives identical rc + candidate tables; file stays under
    16 B/edge."""
    import os

    import numpy as np

    from megahit_tpu.graph import sdbg as S

    rng = np.random.default_rng(11)
    k = 22  # even edge length -> palindromic edges possible
    codes = rng.integers(0, 4, 40_000).astype(np.uint8)
    # splice in an exact palindrome window
    pal = np.concatenate([codes[:11], 3 - codes[:11][::-1]])
    codes[1000:1000 + k] = pal
    starts = np.array([0, len(codes)], dtype=np.int64)
    g = S.build_sdbg(codes, starts, np.ones(1, np.int32), k)
    # flip some interior validity (mid-cleaning state)
    inval = np.zeros(g.size, bool)
    inval[rng.choice(g.real, 50, replace=False)] = True
    g.invalidate(inval)

    path = str(tmp_path / "g.sdbg.npz")
    g.save(path)
    per_edge = os.path.getsize(path) / g.num_valid()
    assert per_edge <= 16, per_edge

    h = S.Sdbg.load(path)
    assert h.k == g.k
    assert h.real == g.real
    np.testing.assert_array_equal(h.keys[:h.real], g.keys[:g.real])
    np.testing.assert_array_equal(h.mult[:h.real], g.mult[:g.real])
    np.testing.assert_array_equal(h.valid[:h.real], g.valid[:g.real])
    # lazily re-derived navigation matches the eagerly-built original
    np.testing.assert_array_equal(h.rc[:h.real], g.rc[:g.real])
    for name in ("oc_t", "ic_t", "oc_s", "ic_s"):
        np.testing.assert_array_equal(
            getattr(h, name)[:h.real], getattr(g, name)[:g.real]
        )


def test_tip_removal_max_len_one_removes_nothing():
    """max_tip_len == 1: chain_len <= max_len - 1 is unsatisfiable, so
    no tips are removed (matches the device path and the reference;
    reachable via driver max_tip_len = max(1, ...) at large k)."""
    import numpy as np

    from megahit_tpu.core import packing
    from megahit_tpu.graph.sdbg import build_sdbg, remove_tips_sdbg

    rng = np.random.default_rng(17)
    genome = rng.integers(0, 4, size=800).astype(np.uint8)
    seqs = [genome[s : s + 120].copy() for s in range(0, 680, 20)]
    for _ in range(10):  # branch reads that create 1-edge tips
        s = int(rng.integers(0, 600))
        seqs.append(np.concatenate(
            [genome[s : s + 22], rng.integers(0, 4, 1).astype(np.uint8)]
        ))
    flat, starts = packing.pack_many(seqs)
    g = build_sdbg(flat, starts, np.ones(len(seqs), np.int32), 22)
    before = g.valid.sum()
    assert remove_tips_sdbg(g, 1) == 0
    assert g.valid.sum() == before


def test_native_chain_rank_matches_pointer_doubling():
    """native graphwalk chain ranking == the device _list_rank
    formulation on random link structures (chains + cycles)."""
    import numpy as np
    import jax.numpy as jnp
    from megahit_tpu.native import chain_rank, collect_chain_edges
    from megahit_tpu.graph.unitig import _list_rank

    rng = np.random.default_rng(7)
    for trial in range(5):
        e = int(rng.integers(5, 200))
        # build a random permutation-ish successor structure: split
        # indices into segments; each segment becomes a chain or cycle
        perm = rng.permutation(e)
        nxt = np.full(e, -1, np.int32)
        prv = np.full(e, -1, np.int32)
        i = 0
        while i < e:
            seg = perm[i:i + int(rng.integers(1, 12))]
            for a, b in zip(seg[:-1], seg[1:]):
                nxt[a], prv[b] = b, a
            if len(seg) > 1 and rng.random() < 0.3:  # close a cycle
                nxt[seg[-1]], prv[seg[0]] = seg[0], seg[-1]
            i += len(seg)
        valid = np.ones(e, bool)
        got = chain_rank(nxt, prv, valid)
        assert got is not None
        cs, ce_, pos, cyc = got

        rounds = max(1, int(np.ceil(np.log2(max(e, 2)))))
        end, _, start, dpos, mn = (
            np.asarray(x) for x in _list_rank(
                jnp.asarray(nxt), jnp.asarray(prv), rounds)
        )
        in_cycle = nxt[end] >= 0
        want_cs = np.where(in_cycle, mn, start)
        want_ce = np.where(in_cycle, prv[mn], end)
        np.testing.assert_array_equal(cs, want_cs)
        np.testing.assert_array_equal(ce_, want_ce)
        np.testing.assert_array_equal(cyc, in_cycle)
        # chain positions must match on non-cycles
        np.testing.assert_array_equal(pos[~cyc], dpos[~cyc])

        # collect_chain_edges walks exactly the chain members in order
        heads = np.flatnonzero((prv < 0))
        lens = np.array(
            [int((cs == cs[h]).sum()) for h in heads], np.int32)
        out = collect_chain_edges(nxt, heads.astype(np.int32), lens)
        assert out is not None
        for h, ln in zip(heads, lens):
            members = np.flatnonzero(cs == cs[h])
            assert set(members) == set(
                out[np.isin(out, members)].tolist())
