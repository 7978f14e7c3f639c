"""Device-resident cleaning (graph/assemble_device.py) parity vs the
host path, forced on the CPU backend via MEGAHIT_TPU_DEVICE_CLEAN=1.

The device engine must reproduce the host cleaning byte for byte:
same contigs (headers, order, strand), same addi/bubble records - the
host path itself is byte-identical to the reference at -t 1, so this
transitively pins the device path to the reference."""

import os

import numpy as np
import pytest

from megahit_tpu.core import packing
from megahit_tpu.graph.counter import count_canonical_kmers
from megahit_tpu.graph.sdbg import sdbg_from_edges
from megahit_tpu.pipeline.assemble import AssembleOptions, assemble

RNG = np.random.default_rng(44)


def _reads_from_genome(genome, n_reads, rl, err=0.0, rng=RNG):
    reads = []
    for _ in range(n_reads):
        s = int(rng.integers(0, len(genome) - rl))
        r = genome[s: s + rl].copy()
        if err:
            m = rng.random(rl) < err
            r[m] = (r[m] + rng.integers(1, 4, int(m.sum()))) % 4
        if rng.random() < 0.5:
            r = packing.revcomp_codes(r)
        reads.append(r)
    return reads


def _build(reads, k1, min_count=1):
    flat, starts = packing.pack_many(reads)
    keys, counts = count_canonical_kmers(flat, starts, k1, min_count)
    return sdbg_from_edges(keys, counts, k1)


def _assemble_both(sdbg_factory, opt):
    out = []
    for flag in ("0", "1"):
        os.environ["MEGAHIT_TPU_DEVICE_CLEAN"] = flag
        try:
            out.append(assemble(sdbg_factory(), opt))
        finally:
            del os.environ["MEGAHIT_TPU_DEVICE_CLEAN"]
    return out


def _records(res):
    def fmt(cs):
        return [(packing.decode(c.codes), c.flag, round(c.multi, 4))
                for c in cs]

    return (fmt(res.contigs), fmt(res.final_contigs),
            fmt(res.addi_contigs), fmt(res.bubbles))


@pytest.mark.parametrize("err,prune,careful", [
    (0.0, 2, False),
    (0.01, 2, True),
    (0.02, 3, True),
])
def test_device_cleaning_matches_host(err, prune, careful):
    rng = np.random.default_rng(hash((err, prune)) % (2**31))
    genome = rng.integers(0, 4, 6000).astype(np.uint8)
    # a repeat to provoke bubbles/branches
    genome[3000:3100] = genome[500:600]
    reads = _reads_from_genome(genome, 1500, 100, err=err, rng=rng)
    k1 = 22

    def factory():
        return _build(reads, k1, min_count=1 if err == 0 else 2)

    opt = AssembleOptions(
        prune_level=prune, careful_bubble=careful,
        min_standalone=200, output_standalone=True,
        merge_similar=0.95,
    )
    host, dev = _assemble_both(factory, opt)
    assert _records(host) == _records(dev)
    assert host.stats == dev.stats


def test_device_cleaning_loop_genome():
    rng = np.random.default_rng(9)
    genome = rng.integers(0, 4, 3000).astype(np.uint8)
    circ = np.concatenate([genome, genome[:120]])
    reads = [circ[s: s + 120].copy()
             for s in range(0, len(genome), 2)]
    k1 = 22

    def factory():
        return _build(reads, k1, min_count=1)

    opt = AssembleOptions(min_standalone=200, output_standalone=True,
                          is_final_round=True)
    host, dev = _assemble_both(factory, opt)
    assert _records(host) == _records(dev)


def test_device_cleaning_final_round_addi():
    """is_final_round=False path: addi contigs + changed tracking."""
    rng = np.random.default_rng(5)
    g1 = rng.integers(0, 4, 4000).astype(np.uint8)
    reads = _reads_from_genome(g1, 2200, 90, err=0.015, rng=rng)
    k1 = 22

    def factory():
        return _build(reads, k1, min_count=2)

    opt = AssembleOptions(prune_level=2, careful_bubble=True,
                          is_final_round=False, min_standalone=300)
    host, dev = _assemble_both(factory, opt)
    assert _records(host) == _records(dev)
