"""Oracle parity: run the REFERENCE megahit on the same input and
compare final contigs (BASELINE.md north star: bit-identical contigs
on the toy dataset).

Requires the reference checkout at /root/reference and a C++
toolchain; skipped otherwise. The reference binary is built once into
a cache directory - building the oracle is not copying it.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from megahit_tpu.core import packing
from megahit_tpu.io.contig_io import read_contigs

REF = "/root/reference"
CACHE = "/tmp/megahit_oracle_build"

pytestmark = pytest.mark.oracle


@pytest.fixture(scope="session")
def ref_megahit():
    if not os.path.isdir(REF) or shutil.which("cmake") is None:
        pytest.skip("reference or toolchain unavailable")
    core = os.path.join(CACHE, "megahit_core")
    driver = os.path.join(CACHE, "megahit")
    if not os.path.exists(core):
        os.makedirs(CACHE, exist_ok=True)
        subprocess.run(
            ["cmake", REF, "-DCMAKE_BUILD_TYPE=Release"],
            cwd=CACHE, check=True, capture_output=True,
        )
        subprocess.run(
            ["make", "-j8", "megahit_core"],
            cwd=CACHE, check=True, capture_output=True,
        )
        shutil.copy(os.path.join(REF, "src", "megahit"), driver)
        os.chmod(driver, 0o755)
    return driver


def canon(codes):
    a = packing.decode(codes)
    b = packing.decode(packing.revcomp_codes(codes))
    return min(a, b)


def _run_ref(ref_megahit, args, out):
    subprocess.run(
        ["python", ref_megahit] + args + ["-o", out, "-t", "4"],
        check=True, capture_output=True,
    )
    return read_contigs(os.path.join(out, "final.contigs.fa"))


def _run_ours(args, out):
    from megahit_tpu.__main__ import main

    assert main(args + ["-o", out]) == 0
    return read_contigs(os.path.join(out, "final.contigs.fa"))


def test_single_genome_bit_identical(ref_megahit, tmp_path):
    import gzip

    rng = np.random.default_rng(20240801)
    genome = rng.integers(0, 4, size=6000).astype(np.uint8)
    p1, p2 = str(tmp_path / "r1.fa.gz"), str(tmp_path / "r2.fa.gz")
    insert, rl = 300, 100
    with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
        for i, s in enumerate(range(0, len(genome) - insert, 3)):
            frag = genome[s : s + insert]
            f1.write(f">r{i}/1\n{packing.decode(frag[:rl])}\n")
            f2.write(
                f">r{i}/2\n"
                f"{packing.decode(packing.revcomp_codes(frag[-rl:]))}\n"
            )
    klist = "21,39,59,79"
    ref = _run_ref(
        ref_megahit, ["-1", p1, "-2", p2, "--k-list", klist],
        str(tmp_path / "ref_out"),
    )
    ours = _run_ours(
        ["-1", p1, "-2", p2, "--k-list", klist],
        str(tmp_path / "our_out"),
    )
    assert {canon(c.codes) for c in ref} == {canon(c.codes) for c in ours}


def test_two_genomes_with_repeat_parity(ref_megahit, tmp_path):
    """Harder case: shared 30bp repeat. Exact set parity (the round-1
    divergence here was traced to contig-orientation and localasm
    deviations, both fixed; see RESULTS.md equivalence study)."""
    import gzip

    rng = np.random.default_rng(1234)
    repeat = rng.integers(0, 4, size=30).astype(np.uint8)
    g1 = np.concatenate([rng.integers(0, 4, 800).astype(np.uint8),
                         repeat,
                         rng.integers(0, 4, 800).astype(np.uint8)])
    g2 = np.concatenate([rng.integers(0, 4, 800).astype(np.uint8),
                         repeat,
                         rng.integers(0, 4, 800).astype(np.uint8)])
    p1, p2 = str(tmp_path / "r1.fa.gz"), str(tmp_path / "r2.fa.gz")
    with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
        n = 0
        for g in (g1, g2):
            for s in range(0, len(g) - 250 + 1, 2):
                frag = g[s : s + 250]
                f1.write(f">x{n}/1\n{packing.decode(frag[:100])}\n")
                f2.write(
                    f">x{n}/2\n"
                    f"{packing.decode(packing.revcomp_codes(frag[-100:]))}\n"
                )
                n += 1
    klist = "21,39"
    ref = _run_ref(
        ref_megahit,
        ["-1", p1, "-2", p2, "--k-list", klist, "--min-contig-len",
         "300"],
        str(tmp_path / "ref_out"),
    )
    ours = _run_ours(
        ["-1", p1, "-2", p2, "--k-list", klist, "--min-contig-len",
         "300"],
        str(tmp_path / "our_out"),
    )
    assert {canon(c.codes) for c in ref} == {canon(c.codes) for c in ours}


def test_mock_community_parity(ref_megahit, tmp_path):
    """Metagenome parity: abundance-skewed community, meta-sensitive;
    both assemblers must recover the same genome content."""
    import gzip

    rng = np.random.default_rng(777)
    sizes = [80_000, 50_000, 30_000]
    covs = [30, 10, 4]
    genomes = [rng.integers(0, 4, s).astype(np.uint8) for s in sizes]
    p1 = str(tmp_path / "r1.fa.gz")
    p2 = str(tmp_path / "r2.fa.gz")
    insert, rl = 300, 100
    with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
        n = 0
        for g, cov in zip(genomes, covs):
            stride = max(1, (2 * rl) // cov)
            for s in range(0, len(g) - insert, stride):
                frag = g[s : s + insert]
                f1.write(f">m{n}/1\n{packing.decode(frag[:rl])}\n")
                f2.write(
                    f">m{n}/2\n"
                    f"{packing.decode(packing.revcomp_codes(frag[-rl:]))}\n"
                )
                n += 1
    args = ["-1", p1, "-2", p2, "--presets", "meta-sensitive",
            "--k-list", "21,41,61", "--min-contig-len", "500"]
    ref = _run_ref(ref_megahit, args, str(tmp_path / "ref_out"))
    ours = _run_ours(args, str(tmp_path / "our_out"))

    def coverage(finals, g):
        gs = packing.decode(g)
        covered = np.zeros(len(g), bool)
        for c in finals:
            for m in (packing.decode(c.codes),
                      packing.decode(packing.revcomp_codes(c.codes))):
                p = gs.find(m)
                if p >= 0:
                    covered[p : p + len(m)] = True
                    break
        return covered.mean()

    for i, g in enumerate(genomes):
        rcov = coverage(ref, g)
        ocov = coverage(ours, g)
        assert ocov >= rcov - 0.02, (
            f"genome {i}: ours {ocov:.2%} vs reference {rcov:.2%}"
        )


TEST_DATA = "/root/reference/test_data"


def _fixture_args():
    """The reference's own --test library layout (src/megahit:582-587):
    interleaved gz + bz2, a pe pair, and se including the loop genome."""
    return [
        "--12", f"{TEST_DATA}/r1.il.fa.gz,{TEST_DATA}/r2.il.fa.bz2",
        "-1", f"{TEST_DATA}/r3_1.fa", "-2", f"{TEST_DATA}/r3_2.fa",
        "-r", f"{TEST_DATA}/r4.fa,{TEST_DATA}/loop.fa",
    ]


def canon_set(contigs):
    """canon() for linear contigs; rotation-invariant canon for loop
    contigs (both assemblers pick an arbitrary traversal anchor)."""
    from megahit_tpu.io.contig_io import FLAG_LOOP

    return {
        canon_loop(c) if c.flag & FLAG_LOOP else canon(c.codes)
        for c in contigs
    }


def test_reference_fixture_matrix(ref_megahit, tmp_path):
    """Both assemblers on the reference's bundled test_data libs
    (mixed gz/bz2 interleaved + pe + se + loop genome)."""
    args = _fixture_args() + ["--k-list", "21,41,61"]
    ref = _run_ref(ref_megahit, args, str(tmp_path / "ref_out"))
    ours = _run_ours(args, str(tmp_path / "our_out"))
    assert canon_set(ref) == canon_set(ours)


def canon_loop(c):
    """Rotation- and strand-invariant form of a loop contig: the string
    is the L-base cycle plus a k-base wrap; the rotation anchor is an
    internal traversal detail in both assemblers."""
    cyc = c.codes[: c.length - c.k]
    best = None
    for codes in (cyc, packing.revcomp_codes(cyc)):
        s = packing.decode(codes)
        d = s + s
        m = min(d[i : i + len(s)] for i in range(len(s)))
        best = m if best is None else min(best, m)
    return best


def test_loop_genome_flag_parity(ref_megahit, tmp_path):
    """The loop genome alone: FLAG_LOOP routing and the EarlyTerminate
    behaviour when a k-round yields no new edges/addi/local
    (reference src/megahit:838-839). The cycle must match up to
    rotation/strand and carry the loop flag in both assemblers."""
    args = ["-r", f"{TEST_DATA}/loop.fa", "--k-list", "21,41",
            "--min-contig-len", "200"]
    ref = _run_ref(ref_megahit, args, str(tmp_path / "ref_out"))
    ours = _run_ours(args, str(tmp_path / "our_out"))
    assert len(ref) == len(ours) == 1
    assert ref[0].flag == ours[0].flag == 3
    assert ref[0].length == ours[0].length
    assert canon_loop(ref[0]) == canon_loop(ours[0])


def test_kmin_1pass_prune3_fixture(ref_megahit, tmp_path):
    """The reference simple_test's second scenario
    (CMakeLists.txt:104-116): --kmin-1pass --prune-level 3
    --prune-depth 0 over the bundled libs."""
    args = _fixture_args() + [
        "--k-list", "21,41", "--kmin-1pass", "--prune-level", "3",
        "--prune-depth", "0",
    ]
    ref = _run_ref(ref_megahit, args, str(tmp_path / "ref_out"))
    ours = _run_ours(args, str(tmp_path / "our_out"))
    assert canon_set(ref) == canon_set(ours)


def test_empty_input_completes(tmp_path):
    """The reference simple_test's empty-input scenario: zero reads
    must produce an empty assembly, not a crash."""
    from megahit_tpu.__main__ import main

    out = str(tmp_path / "out")
    rc = main(["-r", f"{TEST_DATA}/empty.fa", "--k-list", "21,41",
               "-o", out])
    assert rc == 0
    finals = read_contigs(os.path.join(out, "final.contigs.fa"))
    assert finals == []


def test_error_rich_byte_identical_t1(ref_megahit, tmp_path):
    """BYTE-level parity vs the reference at -t 1 on error-rich
    multi-genome reads through a 3-k ladder (no-local: the one
    remaining local-assembly deviation is IDBA's internal hash-table
    iteration order, which only breaks ties between equally-supported
    bubble variants). Locks in: colex edge-id order (ref_rank),
    ToUniqueFormat output strands, stable Refresh slot order,
    canonical-id bubble tie-breaks, bubble record emission, round-half-
    up contig multis, and zero-mul junction edges."""
    import gzip

    rng = np.random.default_rng(10018)
    genomes = [rng.integers(0, 4, s).astype(np.uint8)
               for s in (20442, 39131, 15999)]
    insert, rl, err = 280, 100, 0.005
    p1, p2 = str(tmp_path / "r1.fa.gz"), str(tmp_path / "r2.fa.gz")
    with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
        n = 0
        for g in genomes:
            n_pairs = max(4, int(len(g) * 12 / (2 * rl)))
            starts = rng.integers(0, len(g) - insert, n_pairs)
            for s in sorted(starts.tolist()):
                frag = g[s : s + insert]
                r1 = frag[:rl].copy()
                r2 = packing.revcomp_codes(frag[-rl:]).copy()
                for r in (r1, r2):
                    m = rng.random(rl) < err
                    r[m] = (r[m] + rng.integers(1, 4, int(m.sum()))) % 4
                f1.write(f">p{n}/1\n{packing.decode(r1)}\n")
                f2.write(f">p{n}/2\n{packing.decode(r2)}\n")
                n += 1
    args = ["-1", p1, "-2", p2, "--k-list", "21,41",
            "--min-contig-len", "300", "--no-local"]
    ref_out = str(tmp_path / "ref_out")
    subprocess.run(
        ["python", ref_megahit] + args + ["-o", ref_out, "-t", "1"],
        check=True, capture_output=True,
    )
    from megahit_tpu.__main__ import main

    our_out = str(tmp_path / "our_out")
    assert main(args + ["-o", our_out]) == 0
    with open(os.path.join(ref_out, "final.contigs.fa")) as f:
        ref_bytes = f.read()
    with open(os.path.join(our_out, "final.contigs.fa")) as f:
        our_bytes = f.read()
    assert ref_bytes == our_bytes


@pytest.mark.parametrize("k", [201, 255])
def test_large_k_byte_identical_t1(ref_megahit, tmp_path, k):
    """Single-k parity at the multi-word widths the default ladder
    never reaches (k=201 -> W=13 node words, k=255 -> W=16; reference
    kMaxK=255, sdbg_def.h:21, exercised by its simple_test single-k-255
    scenario, CMakeLists.txt:104-116). Reads are long (400 bp) so
    (k+1)-windows exist; byte-identical finals at -t 1."""
    rng = np.random.default_rng(255_000 + k)
    genome = rng.integers(0, 4, size=8000).astype(np.uint8)
    rl = 400
    p = str(tmp_path / "reads.fa")
    with open(p, "w") as fh:
        for i, s in enumerate(range(0, len(genome) - rl, 7)):
            frag = genome[s: s + rl]
            if i % 3 == 0:
                frag = packing.revcomp_codes(frag)
            fh.write(f">r{i}\n{packing.decode(frag)}\n")
    args = ["-r", p, "--k-list", str(k), "--min-count", "2"]
    ref_out = str(tmp_path / "ref_out")
    subprocess.run(
        ["python", ref_megahit] + args + ["-o", ref_out, "-t", "1"],
        check=True, capture_output=True,
    )
    from megahit_tpu.__main__ import main

    our_out = str(tmp_path / "our_out")
    assert main(args + ["-o", our_out]) == 0
    with open(os.path.join(ref_out, "final.contigs.fa")) as f:
        ref_bytes = f.read()
    with open(os.path.join(our_out, "final.contigs.fa")) as f:
        our_bytes = f.read()
    assert ref_bytes != ""
    assert ref_bytes == our_bytes


def test_random255_simple_test_scenario(ref_megahit, tmp_path):
    """The reference simple_test's own single-k-255 case: 1000 random
    300 bp reads, --k-list 255 --min-count 1 (CMakeLists.txt:110).
    Both assemblers must complete and agree (the random input yields
    no contigs >= the standalone threshold)."""
    rng = np.random.default_rng(10086)
    p = str(tmp_path / "random.fa")
    with open(p, "w") as fh:
        for i in range(1000):
            fh.write(f">{i + 1}\n"
                     f"{packing.decode(rng.integers(0, 4, 300))}\n")
    args = ["-r", p, "--k-list", "255", "--min-count", "1"]
    ref_out = str(tmp_path / "ref_out")
    subprocess.run(
        ["python", ref_megahit] + args + ["-o", ref_out, "-t", "1"],
        check=True, capture_output=True,
    )
    from megahit_tpu.__main__ import main

    our_out = str(tmp_path / "our_out")
    assert main(args + ["-o", our_out]) == 0
    with open(os.path.join(ref_out, "final.contigs.fa")) as f:
        ref_bytes = f.read()
    with open(os.path.join(our_out, "final.contigs.fa")) as f:
        our_bytes = f.read()
    assert ref_bytes == our_bytes
