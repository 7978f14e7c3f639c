"""Systematic reference-equivalence study (VERDICT round-1 item 3).

Generates N randomized mock communities (varying genome count/size,
abundance skew, shared repeats, sequencing error rate, k-list, preset),
assembles each with the reference binary and with megahit_tpu, and
compares final contigs as canonical (strand-folded) string sets.

The round-1 deviation under study: our SdBG keeps node-level adjacency
over the unique (k+1)-mer multiset instead of the reference's BOSS
W/last/$ rows (read_to_sdbg_s2.cpp:521-614).  This script measures the
contig-level effect of that redesign on realistic inputs.

Usage:
  python scripts/equivalence_study.py [N] [--out results.json]
  (expects the reference built at /tmp/megahit_oracle_build)
"""

import gzip
import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from megahit_tpu.core import packing
from megahit_tpu.io.contig_io import read_contigs

REF = "/tmp/megahit_oracle_build/megahit"


def canon(codes):
    s = packing.decode(codes)
    r = packing.decode((3 - codes[::-1]).astype(np.uint8))
    return min(s, r)


def make_community(rng):
    """Randomized community: genomes, repeats, reads with errors."""
    n_genomes = int(rng.integers(1, 5))
    sizes = [int(rng.integers(5_000, 40_000)) for _ in range(n_genomes)]
    covs = [float(rng.choice([4, 8, 15, 30, 60])) for _ in range(n_genomes)]
    err = float(rng.choice([0.0, 0.0, 0.001, 0.005, 0.01]))
    genomes = [rng.integers(0, 4, s).astype(np.uint8) for s in sizes]
    # optionally splice a shared repeat across genomes
    if n_genomes >= 2 and rng.random() < 0.5:
        rep = rng.integers(0, 4, int(rng.integers(25, 120))).astype(np.uint8)
        for g in genomes:
            pos = int(rng.integers(0, len(g) - len(rep)))
            g[pos : pos + len(rep)] = rep
    insert, rl = 280, 100
    reads1, reads2 = [], []
    for g, cov in zip(genomes, covs):
        n_pairs = max(4, int(len(g) * cov / (2 * rl)))
        starts = rng.integers(0, max(1, len(g) - insert), n_pairs)
        for s in sorted(starts.tolist()):
            frag = g[s : s + insert]
            r1 = frag[:rl].copy()
            r2 = packing.revcomp_codes(frag[-rl:]).copy()
            for r in (r1, r2):
                if err > 0:
                    m = rng.random(rl) < err
                    r[m] = (r[m] + rng.integers(1, 4, int(m.sum()))) % 4
            reads1.append(packing.decode(r1))
            reads2.append(packing.decode(r2))
    klist = str(rng.choice(["21,41", "21,39,59", "21,41,61", "25,45"]))
    preset = str(rng.choice(["", "", "meta-sensitive"]))
    return genomes, reads1, reads2, klist, preset, err


def run_one(i, seed, workdir):
    rng = np.random.default_rng(seed)
    genomes, r1, r2, klist, preset, err = make_community(rng)
    p1 = os.path.join(workdir, "r1.fa.gz")
    p2 = os.path.join(workdir, "r2.fa.gz")
    with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
        for j, (a, b) in enumerate(zip(r1, r2)):
            f1.write(f">p{j}/1\n{a}\n")
            f2.write(f">p{j}/2\n{b}\n")
    args = ["-1", p1, "-2", p2, "--k-list", klist,
            "--min-contig-len", "300"]
    if preset:
        args += ["--presets", preset]
    ref_out = os.path.join(workdir, "ref")
    our_out = os.path.join(workdir, "ours")
    ref_threads = os.environ.get("EQUIV_REF_THREADS", "1")
    subprocess.run(
        ["python", REF] + args + ["-o", ref_out, "-t", ref_threads],
        check=True, capture_output=True,
    )
    from megahit_tpu.__main__ import main

    rc = main(args + ["-o", our_out])
    assert rc == 0
    R = {canon(c.codes) for c in
         read_contigs(os.path.join(ref_out, "final.contigs.fa"))}
    O = {canon(c.codes) for c in
         read_contigs(os.path.join(our_out, "final.contigs.fa"))}
    ref_bp = sum(len(s) for s in R)
    our_bp = sum(len(s) for s in O)
    shared = R & O
    return {
        "scenario": i,
        "seed": seed,
        "genomes": [len(g) for g in genomes],
        "err_rate": err,
        "k_list": klist,
        "preset": preset or "default",
        "ref_contigs": len(R),
        "our_contigs": len(O),
        "exact_match": R == O,
        "shared_contigs": len(shared),
        "ref_only_bp": sum(len(s) for s in R - O),
        "our_only_bp": sum(len(s) for s in O - R),
        "ref_bp": ref_bp,
        "our_bp": our_bp,
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    results = []
    for i in range(n):
        workdir = tempfile.mkdtemp(prefix=f"equiv{i}_")
        try:
            r = run_one(i, 10_000 + i, workdir)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
        results.append(r)
        mark = "EXACT" if r["exact_match"] else (
            f"DIFF ref_only={r['ref_only_bp']}bp our_only={r['our_only_bp']}bp"
        )
        print(f"[{i + 1}/{n}] genomes={r['genomes']} err={r['err_rate']} "
              f"k={r['k_list']} {r['preset']}: "
              f"{r['ref_contigs']}/{r['our_contigs']} contigs -> {mark}",
              flush=True)
    n_exact = sum(r["exact_match"] for r in results)
    tot_ref = sum(r["ref_bp"] for r in results)
    tot_diff = sum(r["ref_only_bp"] + r["our_only_bp"] for r in results)
    summary = {
        "scenarios": n,
        "exact": n_exact,
        "total_ref_bp": tot_ref,
        "total_diff_bp": tot_diff,
        "diff_fraction": tot_diff / max(tot_ref, 1),
    }
    print(json.dumps(summary))
    out = "equivalence_study.json"
    for a in sys.argv[2:]:
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
    with open(out, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
