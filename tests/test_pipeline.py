"""End-to-end multi-k pipeline tests through the CLI surface."""

import gzip
import os

import numpy as np
import pytest

from megahit_tpu.__main__ import main
from megahit_tpu.core import packing
from megahit_tpu.io.contig_io import read_contigs

RNG = np.random.default_rng(1234)


def write_pe(genome, out_dir, name, insert=250, rl=100, stride=2):
    p1 = os.path.join(out_dir, f"{name}_1.fa.gz")
    p2 = os.path.join(out_dir, f"{name}_2.fa.gz")
    with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
        for i, s in enumerate(range(0, len(genome) - insert + 1, stride)):
            frag = genome[s : s + insert]
            f1.write(f">{name}{i}/1\n{packing.decode(frag[:rl])}\n")
            f2.write(
                f">{name}{i}/2\n"
                f"{packing.decode(packing.revcomp_codes(frag[-rl:]))}\n"
            )
    return p1, p2


def canon(codes):
    a = packing.decode(codes)
    b = packing.decode(packing.revcomp_codes(codes))
    return min(a, b)


def test_repeat_resolved_by_higher_k(tmp_path):
    # two genomes share a 30 bp repeat: branches at k=21 (22-mers can't
    # span it), resolved at k=39 via junction-spanning iterate edges
    repeat = RNG.integers(0, 4, size=30).astype(np.uint8)
    a1 = RNG.integers(0, 4, size=800).astype(np.uint8)
    a2 = RNG.integers(0, 4, size=800).astype(np.uint8)
    b1 = RNG.integers(0, 4, size=800).astype(np.uint8)
    b2 = RNG.integers(0, 4, size=800).astype(np.uint8)
    g1 = np.concatenate([a1, repeat, a2])
    g2 = np.concatenate([b1, repeat, b2])
    p1a, p2a = write_pe(g1, str(tmp_path), "a")
    p1b, p2b = write_pe(g2, str(tmp_path), "b")
    out = str(tmp_path / "out")
    rc = main([
        "-1", f"{p1a},{p1b}", "-2", f"{p2a},{p2b}", "-o", out,
        "--k-list", "21,39", "--no-local", "--keep-tmp-files",
        "--min-contig-len", "300",
    ])
    assert rc == 0
    finals = read_contigs(os.path.join(out, "final.contigs.fa"))
    # both genomes must be recovered as one contig each; the terminal
    # 2 bases of each genome have k-mer coverage 1 (< min_count) so the
    # assembler correctly trims them
    assert len(finals) == 2, [c.length for c in finals]
    gs1, gs2 = packing.decode(g1), packing.decode(g2)
    hits = set()
    for c in finals:
        assert c.length >= len(g1) - 4
        s = packing.decode(c.codes)
        rc = packing.decode(packing.revcomp_codes(c.codes))
        for name, g in (("g1", gs1), ("g2", gs2)):
            if s in g or rc in g:
                hits.add(name)
    assert hits == {"g1", "g2"}


def test_continue_resumes(tmp_path):
    genome = RNG.integers(0, 4, size=1500).astype(np.uint8)
    p1, p2 = write_pe(genome, str(tmp_path), "g")
    out = str(tmp_path / "out")
    args = ["-1", p1, "-2", p2, "-o", out, "--k-list", "21,29",
            "--no-local", "--keep-tmp-files"]
    assert main(args) == 0
    ck = os.path.join(out, "checkpoints.txt")
    n_stages = sum(1 for _ in open(ck))
    finals0 = read_contigs(os.path.join(out, "final.contigs.fa"))
    # resume: all stages skipped, output unchanged
    os.remove(os.path.join(out, "final.contigs.fa"))
    # drop the final checkpoint so merge_final reruns
    lines = open(ck).read().splitlines()
    with open(ck, "w") as fh:
        fh.write("\n".join(lines[:-1]) + "\n")
    assert main(args + ["--continue"]) == 0
    finals1 = read_contigs(os.path.join(out, "final.contigs.fa"))
    assert [canon(c.codes) for c in finals1] == \
        [canon(c.codes) for c in finals0]
    assert sum(1 for _ in open(ck)) == n_stages


def test_test_mode(tmp_path):
    """--test runs the reference's full fixture matrix in one
    invocation (src/megahit:582-587, test_data/): gz + bz2 interleaved
    PE, plain PE, SE, a loop genome and an empty lib."""
    out = str(tmp_path / "out")
    assert main(["--test", "-o", out, "--no-local"]) == 0
    assert os.path.exists(os.path.join(out, "done"))
    gen = sorted(os.listdir(os.path.join(out, "test_data")))
    assert gen == ["test_empty.fa", "test_il1.fa.gz",
                   "test_il2.fa.bz2", "test_loop.fa", "test_r1.fa",
                   "test_r2.fa", "test_se.fa"]
    finals = read_contigs(os.path.join(out, "final.contigs.fa"))
    assert len(finals) == 2
    finals.sort(key=lambda c: -c.length)
    assert finals[0].length > 5900          # linear toy genome
    assert finals[1].flag == 3              # loop contig from loop lib
    assert 540 <= finals[1].length <= 650


def test_tmp_dir_version_and_deprecated_flags(tmp_path, capsys):
    """--tmp-dir roots a megahit_tmp_* dir, resumes into the SAME dir
    on --continue; -v/--version prints and exits; deprecated flags are
    accepted with a warning (reference src/megahit:397-413,458-461)."""
    assert main(["--version"]) == 0
    assert "megahit_tpu v" in capsys.readouterr().out

    genome = RNG.integers(0, 4, size=1200).astype(np.uint8)
    p1, p2 = write_pe(genome, str(tmp_path), "t")
    out = str(tmp_path / "out")
    troot = str(tmp_path / "troot")
    args = ["-1", p1, "-2", p2, "-o", out, "--k-list", "21",
            "--no-local", "--keep-tmp-files", "--tmp-dir", troot,
            "--mem-flag", "0", "--cpu-only", "--use-gpu"]
    assert main(args) == 0
    assert "deprecated" in capsys.readouterr().err
    tmps = os.listdir(troot)
    assert len(tmps) == 1 and tmps[0].startswith("megahit_tmp_")
    assert os.path.isdir(os.path.join(troot, tmps[0], "k21"))
    # resume reuses the resolved tmp dir instead of minting a new one
    ck = os.path.join(out, "checkpoints.txt")
    lines = open(ck).read().splitlines()
    with open(ck, "w") as fh:
        fh.write("\n".join(lines[:-1]) + "\n")
    assert main(args + ["--continue"]) == 0
    assert os.listdir(troot) == tmps
    finals = read_contigs(os.path.join(out, "final.contigs.fa"))
    assert len(finals) == 1


def test_mesh_pipeline_matches_single_device(tmp_path):
    """--mesh (8 virtual devices): counting shards over the mesh and
    seq2sdbg routes through the mesh-sorted bucketed builder; final
    contigs match the single-device run exactly."""
    genome = RNG.integers(0, 4, size=2500).astype(np.uint8)
    p1, p2 = write_pe(genome, str(tmp_path), "m")
    outs = []
    for name, extra in (("plain", []), ("mesh", ["--mesh"])):
        out = str(tmp_path / name)
        assert main(["-1", p1, "-2", p2, "-o", out, "--k-list", "21,29",
                     "--no-local"] + extra) == 0
        outs.append(sorted(
            canon(c.codes)
            for c in read_contigs(os.path.join(out, "final.contigs.fa"))
        ))
    assert outs[0] == outs[1] and len(outs[0]) >= 1
