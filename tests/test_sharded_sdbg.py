"""Sharded SdBG persistence (VERDICT r4 item 6): per-shard files + a
bucket manifest, the mesh-scale analogue of the reference's
thread-sharded SdbgWriter/SdbgMeta (sdbg_writer.h:19-63,
sdbg_meta.cpp:51-75)."""

import json
import os

import numpy as np
import pytest

from megahit_tpu.core import packing
from megahit_tpu.graph import bucketed as bk
from megahit_tpu.graph.counter import count_canonical_kmers
from megahit_tpu.graph.sdbg import Sdbg, sdbg_from_edges

RNG = np.random.default_rng(77)


def _graph(n_bases=20000, k1=22):
    genome = RNG.integers(0, 4, n_bases).astype(np.uint8)
    reads = [genome[s:s + 100] for s in range(0, n_bases - 100, 3)]
    flat, starts = packing.pack_many(reads)
    keys, counts = count_canonical_kmers(flat, starts, k1, 1)
    return sdbg_from_edges(keys, counts, k1)


def _assert_equal_graphs(a: Sdbg, b: Sdbg):
    assert a.k == b.k and a.real == b.real
    np.testing.assert_array_equal(a.keys[:a.real], b.keys[:b.real])
    np.testing.assert_array_equal(a.mult[:a.real], b.mult[:b.real])
    np.testing.assert_array_equal(a.valid[:a.real], b.valid[:b.real])


def test_sharded_roundtrip_multi_shard(tmp_path):
    sdbg = _graph()
    d = str(tmp_path / "shards")
    sdbg.save_sharded(d, rows_per_shard=4096)  # force many shards
    man = json.load(open(os.path.join(d, "sdbg_manifest.json")))
    assert man["n_real"] == sdbg.real
    assert len(man["shards"]) > 3
    # shard boundaries are bucket boundaries: consecutive shards never
    # share a bucket
    for s1, s2 in zip(man["shards"], man["shards"][1:]):
        assert s1["bucket_hi"] <= s2["bucket_lo"] + 1
        assert s2["row_start"] == s1["row_start"] + s1["rows"]
    back = Sdbg.load_sharded(d)
    _assert_equal_graphs(sdbg, back)
    # navigation rebuilds identically
    np.testing.assert_array_equal(sdbg.rc[:sdbg.real], back.rc[:back.real])


def test_sharded_preserves_validity(tmp_path):
    sdbg = _graph(8000)
    kill = np.zeros(sdbg.size, dtype=bool)
    kill[np.arange(0, sdbg.real, 17)] = True
    sdbg.invalidate(kill)
    d = str(tmp_path / "shards")
    sdbg.save_sharded(d, rows_per_shard=2048)
    back = Sdbg.load_sharded(d)
    _assert_equal_graphs(sdbg, back)


def test_sharded_bucket_range_load(tmp_path):
    """A bucket range reads only its shards and returns exactly the
    rows of those buckets (mesh redistribution primitive)."""
    sdbg = _graph()
    d = str(tmp_path / "shards")
    sdbg.save_sharded(d, rows_per_shard=4096)
    b16 = (sdbg.keys[:sdbg.real, 0] >> np.uint32(16)).astype(np.int64)
    lo_b, hi_b = 17000, 40000
    sel = (b16 >= lo_b) & (b16 < hi_b)
    keys, mult, valid, off = Sdbg.load_sharded_rows(d, lo_b, hi_b)
    np.testing.assert_array_equal(keys, sdbg.keys[:sdbg.real][sel])
    np.testing.assert_array_equal(mult, sdbg.mult[:sdbg.real][sel])
    np.testing.assert_array_equal(valid, sdbg.valid[:sdbg.real][sel])
    assert off == int(np.flatnonzero(sel)[0]) if sel.any() else True
    # full cover through disjoint ranges reassembles the graph
    parts = [Sdbg.load_sharded_rows(d, lo, hi)
             for lo, hi in ((0, 20000), (20000, 45000), (45000, 65536))]
    allk = np.concatenate([p[0] for p in parts], axis=0)
    np.testing.assert_array_equal(allk, sdbg.keys[:sdbg.real])


def test_empty_graph_roundtrip(tmp_path):
    k1 = 22
    sdbg = sdbg_from_edges(
        np.zeros((0, 2), np.uint32), np.zeros(0, np.int32), k1)
    d = str(tmp_path / "shards")
    sdbg.save_sharded(d)
    back = Sdbg.load_sharded(d)
    assert back.real == 0 and back.k == k1


def test_builder_writes_shards_during_build(tmp_path):
    """build_sdbg_bucketed(shard_dir=...) streams each round's edges
    into the sharded writer; the shards reload to the same graph."""
    genome = RNG.integers(0, 4, 30000).astype(np.uint8)
    reads = [genome[s:s + 90] for s in range(0, len(genome) - 90, 4)]
    flat, starts = packing.pack_many(reads)
    src = [bk.PoolSource(flat, starts, np.ones(len(reads), np.int32))]
    d = str(tmp_path / "shards")
    sdbg = bk.build_sdbg_bucketed(
        src, 22, budget_rows=8192, spill_dir=str(tmp_path / "spill"),
        shard_dir=d, min_count=1, mult_mode="count")
    back = Sdbg.load_sharded(d)
    _assert_equal_graphs(sdbg, back)


@pytest.mark.slow
def test_mesh_built_10m_edge_roundtrip(tmp_path):
    """VERDICT r4 item 6 Done criterion: round-trip on a mesh-built
    >= 1e7-edge graph."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
    big = RNG.integers(0, 4, 6_000_000).astype(np.uint8)
    reads = [big[s:s + 100] for s in range(0, len(big) - 100, 50)]
    flat, starts = packing.pack_many(reads)
    src = [bk.PoolSource(flat, starts, np.ones(len(reads), np.int32))]
    d = str(tmp_path / "shards")
    sdbg = bk.build_sdbg_bucketed(
        src, 22, budget_rows=1 << 22,
        spill_dir=str(tmp_path / "spill"), mesh=mesh, shard_dir=d,
        min_count=1, mult_mode="count")
    assert sdbg.num_valid() >= 10_000_000
    back = Sdbg.load_sharded(d)
    _assert_equal_graphs(sdbg, back)
    man = json.load(open(os.path.join(d, "sdbg_manifest.json")))
    assert len(man["shards"]) >= 1
