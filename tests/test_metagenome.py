"""Mock-community metagenome assembly: abundance-skewed genomes must
each be recovered (the reference's headline use case)."""

import gzip
import os

import numpy as np

from megahit_tpu.__main__ import main
from megahit_tpu.core import packing
from megahit_tpu.io.contig_io import read_contigs

RNG = np.random.default_rng(770)


def test_mock_community_recovery(tmp_path):
    sizes = [100_000, 60_000, 40_000]
    covs = [30, 10, 3]
    genomes = [RNG.integers(0, 4, s).astype(np.uint8) for s in sizes]
    p1 = str(tmp_path / "r1.fa.gz")
    p2 = str(tmp_path / "r2.fa.gz")
    insert, rl = 300, 100
    n = 0
    with gzip.open(p1, "wt", compresslevel=1) as f1, \
            gzip.open(p2, "wt", compresslevel=1) as f2:
        for g, cov in zip(genomes, covs):
            stride = max(1, (2 * rl) // cov)
            for s in range(0, len(g) - insert, stride):
                frag = g[s : s + insert]
                f1.write(f">q{n}/1\n{packing.decode(frag[:rl])}\n")
                f2.write(
                    f">q{n}/2\n"
                    f"{packing.decode(packing.revcomp_codes(frag[-rl:]))}\n"
                )
                n += 1
    out = str(tmp_path / "out")
    rc = main(["-1", p1, "-2", p2, "-o", out, "--presets",
               "meta-sensitive", "--k-list", "21,41,61",
               "--min-contig-len", "500"])
    assert rc == 0
    finals = read_contigs(os.path.join(out, "final.contigs.fa"))
    for i, g in enumerate(genomes):
        gs = packing.decode(g)
        covered = np.zeros(len(g), bool)
        for c in finals:
            s = packing.decode(c.codes)
            rcs = packing.decode(packing.revcomp_codes(c.codes))
            for m in (s, rcs):
                p = gs.find(m)
                if p >= 0:
                    covered[p : p + len(m)] = True
                    break
        assert covered.mean() > 0.95, (
            f"genome {i} ({covs[i]}x) only {covered.mean():.2%} recovered"
        )
