"""Device-resident window->SdBG build (graph/sdbg.py
build_sdbg_device_resident, VERDICT r4 item 7): byte parity with the
host finalize path, which is itself reference-parity-tested."""

import numpy as np
import pytest

from megahit_tpu.core import packing
from megahit_tpu.graph.sdbg import (
    build_sdbg, build_sdbg_device_resident, window_edge_multiset,
    _finalize_sdbg,
)

RNG = np.random.default_rng(99)


def _pool(n_seqs, lmin, lmax):
    seqs = [RNG.integers(0, 4, int(RNG.integers(lmin, lmax))).astype(
        np.uint8) for _ in range(n_seqs)]
    return packing.pack_many(seqs)


def _assert_same(a, b):
    assert a.k == b.k and a.real == b.real
    np.testing.assert_array_equal(a.keys[:a.real], b.keys[:b.real])
    np.testing.assert_array_equal(a.mult[:a.real], b.mult[:b.real])


@pytest.mark.parametrize("k1", [22, 32, 62])
def test_device_build_matches_host(k1):
    flat, starts = _pool(80, 60, 200)
    mults = RNG.integers(1, 9, 80).astype(np.int32)
    host = build_sdbg(flat, starts, mults, k1)
    dev = build_sdbg_device_resident(flat, starts, mults, k1)
    _assert_same(host, dev)


def test_device_build_with_edge_inputs():
    from megahit_tpu.core import kmerops

    k1 = 22
    flat, starts = _pool(50, 80, 150)
    mults = RNG.integers(1, 5, 50).astype(np.int32)
    w = kmerops.words_per_kmer(k1)
    # synthetic canonical edge inputs (iterate-output analogue)
    ek = np.asarray(kmerops.mask_tail(
        RNG.integers(0, 2 ** 32, (200, w)).astype(np.uint32), k1))
    ec = RNG.integers(1, 30, 200).astype(np.int32)

    keys, kmults = window_edge_multiset(flat, starts, mults, k1)
    import jax.numpy as jnp

    rc = np.asarray(kmerops.revcomp_kmers(jnp.asarray(ek), k1))
    hk = np.concatenate([keys, ek, rc], axis=0)
    hm = np.concatenate([kmults, ec, ec]).astype(np.int32)
    host = _finalize_sdbg(hk, hm, k1, n_windows=len(hk))
    dev = build_sdbg_device_resident(
        flat, starts, mults, k1, edge_keys=ek, edge_counts=ec)
    _assert_same(host, dev)


def test_device_build_short_and_empty_seqs():
    k1 = 22
    seqs = [RNG.integers(0, 4, n).astype(np.uint8)
            for n in (5, 21, 22, 23, 300, 0, 40)]
    flat, starts = packing.pack_many(seqs)
    mults = np.ones(len(seqs), np.int32)
    host = build_sdbg(flat, starts, mults, k1)
    dev = build_sdbg_device_resident(flat, starts, mults, k1)
    _assert_same(host, dev)


def test_device_build_all_t_key_at_k32():
    """k % 16 == 0: a real all-T 32-mer collides with the sentinel
    pattern; its multiplicity must survive max-dedup with the -1
    sentinel rows."""
    k1 = 32
    polyt = np.full(80, 3, np.uint8)  # TTTT... covers all-T 32-mers
    other = RNG.integers(0, 4, 150).astype(np.uint8)
    flat, starts = packing.pack_many([polyt, other])
    mults = np.array([7, 2], np.int32)
    host = build_sdbg(flat, starts, mults, k1)
    dev = build_sdbg_device_resident(flat, starts, mults, k1)
    _assert_same(host, dev)
    # the all-ones key really is present with its real mult
    ones_row = np.full(host.keys.shape[1], 0xFFFFFFFF, np.uint32)
    idx = np.flatnonzero((dev.keys[:dev.real] == ones_row).all(axis=1))
    assert len(idx) == 1 and dev.mult[idx[0]] == 7


def test_pipeline_device_build_byte_identical(tmp_path):
    """Full multi-k pipeline with the device-resident finalize forced
    on: final contigs byte-identical to the host finalize."""
    import os

    from megahit_tpu.__main__ import main
    from megahit_tpu.io.contig_io import read_contigs

    genome = RNG.integers(0, 4, 5000).astype(np.uint8)
    p1 = tmp_path / "r1.fa"
    p2 = tmp_path / "r2.fa"
    with open(p1, "w") as f1, open(p2, "w") as f2:
        for i, s in enumerate(range(0, 4700, 3)):
            frag = genome[s:s + 280]
            f1.write(f">x{i}/1\n{packing.decode(frag[:100])}\n")
            f2.write(f">x{i}/2\n"
                     f"{packing.decode(packing.revcomp_codes(frag[-100:]))}\n")
    outs = {}
    for mode in ("0", "1"):
        out = str(tmp_path / f"out{mode}")
        os.environ["MEGAHIT_TPU_DEVICE_BUILD"] = mode
        try:
            assert main(["-1", str(p1), "-2", str(p2), "-o", out,
                         "--k-list", "21,41", "--no-local"]) == 0
        finally:
            del os.environ["MEGAHIT_TPU_DEVICE_BUILD"]
        outs[mode] = [
            (packing.decode(c.codes), c.flag, round(c.multi, 4))
            for c in read_contigs(out + "/final.contigs.fa")]
    assert outs["0"] == outs["1"] and outs["0"]
