"""Reproducible synthetic metagenome community generator.

Random genomes with log-distributed abundances, optional shared mobile
element, paired-end reads with substitution errors. Used for the
community soak results in RESULTS.md.

Usage:
    python scripts/make_community.py OUTDIR [--genomes 20]
        [--min-bp 100000] [--max-bp 600000] [--min-cov 2]
        [--max-cov 80] [--read-len 150] [--error 0.002] [--seed 0]
        [--mobile-bp 1000] [--mobile-share 0.3]

Writes OUTDIR/genome_{i}.fa, reads_1.fa, reads_2.fa, manifest.json.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from make_ecoli import BASES, COMP, write_fasta


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--genomes", type=int, default=20)
    ap.add_argument("--min-bp", type=int, default=100_000)
    ap.add_argument("--max-bp", type=int, default=600_000)
    ap.add_argument("--min-cov", type=float, default=2.0)
    ap.add_argument("--max-cov", type=float, default=80.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--insert", type=int, default=300)
    ap.add_argument("--insert-sd", type=int, default=25)
    ap.add_argument("--error", type=float, default=0.002)
    ap.add_argument("--mobile-bp", type=int, default=1000)
    ap.add_argument("--mobile-share", type=float, default=0.3,
                    help="fraction of genomes carrying the shared "
                    "mobile element")
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()

    rng = np.random.default_rng(a.seed)
    os.makedirs(a.outdir, exist_ok=True)

    # log-uniform abundances
    covs = np.exp(rng.uniform(np.log(a.min_cov), np.log(a.max_cov),
                              a.genomes))
    sizes = rng.integers(a.min_bp, a.max_bp + 1, a.genomes)
    mobile = BASES[rng.integers(0, 4, a.mobile_bp)] \
        if a.mobile_bp > 0 else None
    carriers = set(
        rng.choice(a.genomes, max(1, int(a.mobile_share * a.genomes)),
                   replace=False).tolist()
    ) if mobile is not None else set()

    r1_parts, r2_parts = [], []
    manifest = []
    rl, ins_mu, ins_sd = a.read_len, a.insert, a.insert_sd
    for gi in range(int(a.genomes)):
        g = BASES[rng.integers(0, 4, int(sizes[gi]))]
        if gi in carriers:
            at = int(rng.integers(0, len(g) - len(mobile)))
            g[at : at + len(mobile)] = mobile
        write_fasta(os.path.join(a.outdir, f"genome_{gi}.fa"),
                    g[None, :], f"g{gi}_")
        n_pairs = int(len(g) * covs[gi] / (2 * rl))
        ins = np.clip(
            rng.normal(ins_mu, ins_sd, n_pairs).astype(np.int64),
            rl + 10, ins_mu + 6 * ins_sd,
        )
        starts = rng.integers(0, len(g) - ins.max() - 1, n_pairs)
        idx1 = starts[:, None] + np.arange(rl)[None, :]
        r1 = g[idx1]
        idx2 = (starts + ins)[:, None] - 1 - np.arange(rl)[None, :]
        r2 = COMP[g[idx2]]
        if a.error > 0:
            for r in (r1, r2):
                m = rng.random(r.shape) < a.error
                r[m] = BASES[rng.integers(0, 4, int(m.sum()))]
        r1_parts.append(r1)
        r2_parts.append(r2)
        manifest.append({"genome": gi, "bp": int(sizes[gi]),
                         "cov": round(float(covs[gi]), 2),
                         "mobile": gi in carriers,
                         "pairs": n_pairs})

    r1 = np.concatenate(r1_parts)
    r2 = np.concatenate(r2_parts)
    perm = rng.permutation(len(r1))
    write_fasta(os.path.join(a.outdir, "reads_1.fa"), r1[perm], "r")
    write_fasta(os.path.join(a.outdir, "reads_2.fa"), r2[perm], "r")
    with open(os.path.join(a.outdir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    tot = 2 * len(r1) * rl
    print(f"{a.genomes} genomes, {int(sizes.sum())} bp total genome, "
          f"{tot / 1e6:.0f} Mbp reads -> {a.outdir}")


if __name__ == "__main__":
    main()
