"""Input format coverage: interleaved --12, FASTQ, bz2, mixed libs
(reference --test exercises gz+bz2 interleaved + paired + se,
src/megahit:582-587)."""

import bz2
import gzip
import os

import numpy as np

from megahit_tpu.__main__ import main
from megahit_tpu.core import packing
from megahit_tpu.io.contig_io import read_contigs
from megahit_tpu.io.lib import build_lib

RNG = np.random.default_rng(909)


def _genome_reads(genome, insert=250, rl=100, stride=3):
    for s in range(0, len(genome) - insert + 1, stride):
        frag = genome[s : s + insert]
        yield (packing.decode(frag[:rl]),
               packing.decode(packing.revcomp_codes(frag[-rl:])))


def test_interleaved_bz2_fastq_mixed(tmp_path):
    genome = RNG.integers(0, 4, size=2000).astype(np.uint8)
    il = tmp_path / "il.fq.bz2"   # interleaved FASTQ, bz2
    se = tmp_path / "se.fa.gz"    # single-end FASTA, gz
    with bz2.open(il, "wt") as f:
        for i, (r1, r2) in enumerate(_genome_reads(genome)):
            f.write(f"@p{i}/1\n{r1}\n+\n{'I' * len(r1)}\n")
            f.write(f"@p{i}/2\n{r2}\n+\n{'I' * len(r2)}\n")
    with gzip.open(se, "wt") as f:
        for i in range(0, 1900, 7):
            f.write(f">s{i}\n{packing.decode(genome[i:i+90])}\n")

    lib = build_lib([], [], [str(il)], [str(se)])
    assert lib.num_seqs > 0
    assert lib.lib_ranges[0][2] is True   # interleaved lib is paired
    assert lib.lib_ranges[1][2] is False

    out = str(tmp_path / "out")
    rc = main(["--12", str(il), "-r", str(se), "-o", out,
               "--k-list", "21,41", "--no-local"])
    assert rc == 0
    finals = read_contigs(os.path.join(out, "final.contigs.fa"))
    assert len(finals) == 1
    s = packing.decode(finals[0].codes)
    g = packing.decode(genome)
    rcs = packing.decode(packing.revcomp_codes(finals[0].codes))
    assert (s in g) or (rcs in g)
    assert finals[0].length > 1900


def test_n_bases_trimmed(tmp_path):
    p = tmp_path / "n.fa"
    genome = RNG.integers(0, 4, size=600).astype(np.uint8)
    with open(p, "w") as f:
        for i in range(0, 500, 2):
            s = packing.decode(genome[i : i + 100])
            # embed N runs: reference TrimN keeps the first ACGT run
            f.write(f">r{i}\nNN{s[:60]}NNN{s[60:]}\n")
    out = str(tmp_path / "out")
    rc = main(["-r", str(p), "-o", out, "--k-list", "21",
               "--no-local", "--min-contig-len", "100"])
    assert rc == 0
    finals = read_contigs(os.path.join(out, "final.contigs.fa"))
    # only the first 60bp run survives trimming -> contigs from that
    g = packing.decode(genome)
    for c in finals:
        s = packing.decode(c.codes)
        rcs = packing.decode(packing.revcomp_codes(c.codes))
        assert (s in g) or (rcs in g)


def test_chunked_ingest_boundaries(tmp_path):
    """The native partial parser must carry cut records across every
    possible chunk boundary: parse with pathologically small chunks
    and compare against the whole-buffer parse (FASTA multi-line,
    FASTQ with '@' inside quality strings, N-trimming, CRLF)."""
    import gzip

    import numpy as np

    from megahit_tpu.io.fastx import read_fastx_flat

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGTN", np.uint8)

    fa = []
    for i in range(50):
        s = bases[rng.integers(0, 5, int(rng.integers(1, 200)))]
        seq = s.tobytes()
        # multi-line records with CRLF sprinkled in
        lines = [seq[j:j + 37] for j in range(0, len(seq), 37)]
        sep = b"\r\n" if i % 7 == 0 else b"\n"
        fa.append(b">r" + str(i).encode() + b" extra\n"
                  + sep.join(lines) + b"\n")
    fa_path = str(tmp_path / "t.fa.gz")
    with gzip.open(fa_path, "wb") as fh:
        fh.write(b"".join(fa))

    fq = []
    for i in range(60):
        s = bases[rng.integers(0, 4, int(rng.integers(1, 180)))]
        qual = bytes(rng.integers(33, 74, len(s)).astype(np.uint8))
        # '@' is a legal quality char - boundaries must not misparse
        qual = b"@" + qual[1:] if len(qual) > 1 else b"@"
        fq.append(b"@q" + str(i).encode() + b"\n" + s.tobytes()
                  + b"\n+\n" + qual + b"\n")
    fq_path = str(tmp_path / "t.fq.gz")
    with gzip.open(fq_path, "wb") as fh:
        fh.write(b"".join(fq))

    for path in (fa_path, fq_path):
        want = read_fastx_flat(path, chunk_bytes=1 << 30)
        for chunk in (17, 64, 401, 4096):
            got = read_fastx_flat(path, chunk_bytes=chunk)
            np.testing.assert_array_equal(got[0], want[0]), (path, chunk)
            np.testing.assert_array_equal(got[1], want[1]), (path, chunk)
