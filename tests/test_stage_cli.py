"""Per-stage subcommand CLI: chain the stages by hand like the
reference's megahit_core subprograms and verify the result matches the
full driver."""

import gzip
import os

import numpy as np

from megahit_tpu.core import packing
from megahit_tpu.io.contig_io import read_contigs
from megahit_tpu.stage_cli import main as stage

RNG = np.random.default_rng(4242)


def test_manual_stage_chain(tmp_path):
    genome = RNG.integers(0, 4, size=3000).astype(np.uint8)
    p1 = str(tmp_path / "r1.fa.gz")
    p2 = str(tmp_path / "r2.fa.gz")
    insert, rl = 250, 100
    with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
        for i, s in enumerate(range(0, len(genome) - insert + 1, 2)):
            frag = genome[s : s + insert]
            f1.write(f">x{i}/1\n{packing.decode(frag[:rl])}\n")
            f2.write(
                f">x{i}/2\n"
                f"{packing.decode(packing.revcomp_codes(frag[-rl:]))}\n"
            )
    d = str(tmp_path)
    lib = os.path.join(d, "lib.npz")
    assert stage(["buildlib", "-1", p1, "-2", p2, "-o", lib]) == 0
    assert stage(["count", "--lib", lib, "-k", "21", "-m", "2",
                  "-o", os.path.join(d, "k21")]) == 0
    assert os.path.exists(os.path.join(d, "k21.counting"))
    assert stage(["seq2sdbg", "--edges", os.path.join(d, "k21.edges.npz"),
                  "--need-mercy", "--lib", lib, "-k", "21",
                  "-o", os.path.join(d, "k21.sdbg.npz")]) == 0
    assert stage(["assemble", "-s", os.path.join(d, "k21.sdbg.npz"),
                  "-o", os.path.join(d, "k21"),
                  "--careful-bubble"]) == 0
    contigs = read_contigs(os.path.join(d, "k21.contigs.fa"))
    assert len(contigs) >= 1

    assert stage(["local", "-c", os.path.join(d, "k21.contigs.fa"),
                  "--lib", lib, "--kmax", "41",
                  "-o", os.path.join(d, "k21.local.fa")]) == 0
    assert stage(["iterate", "-c", os.path.join(d, "k21.contigs.fa"),
                  "-b", os.path.join(d, "k21.bubble_seq.fa"),
                  "--lib", lib, "-k", "21", "-s", "20",
                  "-o", os.path.join(d, "k41")]) == 0
    assert stage(["seq2sdbg", "--edges", os.path.join(d, "k41.edges.npz"),
                  "--contig", os.path.join(d, "k21.contigs.fa"),
                  "--local-contig", os.path.join(d, "k21.local.fa"),
                  "-k", "41", "--kmer-from", "21",
                  "-o", os.path.join(d, "k41.sdbg.npz")]) == 0
    assert stage(["assemble", "-s", os.path.join(d, "k41.sdbg.npz"),
                  "-o", os.path.join(d, "k41"), "--is-final-round",
                  "--output-standalone"]) == 0
    finals = read_contigs(os.path.join(d, "k41.contigs.fa")) + \
        read_contigs(os.path.join(d, "k41.final.contigs.fa"))
    best = max(finals, key=lambda c: c.length)
    g = packing.decode(genome)
    s = packing.decode(best.codes)
    rcs = packing.decode(packing.revcomp_codes(best.codes))
    assert (s in g) or (rcs in g)
    assert best.length > 2900
