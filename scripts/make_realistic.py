"""Realistic Illumina-like FASTQ simulator (VERDICT r4 item 8 proxy).

The sandbox has no network, so SRA data (the reference CI uses a 4M-read
SRR7521507 subsample, azure-pipelines.yml:79-83) can't be fetched; this
generates the failure modes real FASTQ brings that the clean simulators
don't:

- position-dependent substitution error (3' ramp: ~0.1% at the 5' end
  rising to ~1.5% at the 3' end, the classic Illumina profile)
- PHRED quality strings correlated with the per-base error rate
  (errors drawn per-base from the quality model, not a flat rate)
- adapter read-through: short-insert pairs read into the (fixed)
  adapter sequence at the 3' end
- N calls (quality-2 positions, clustered toward read ends)
- optical/PCR duplicates
- coverage skew (log-normal per-window abundance wobble)
- a small fraction of truncated (short) reads

Writes OUTDIR/genome.fa, reads_1.fq.gz, reads_2.fq.gz.

Usage:
  python scripts/make_realistic.py OUTDIR [--genome-bp 4600000]
      [--coverage 40] [--read-len 150] [--seed 1]
"""

from __future__ import annotations

import argparse
import gzip
import os

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = np.zeros(256, dtype=np.uint8)
for a, b in zip(b"ACGTN", b"TGCAN"):
    COMP[a] = b

# TruSeq-style adapters (public, standard constants)
ADAPTER1 = np.frombuffer(b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA",
                         dtype=np.uint8)
ADAPTER2 = np.frombuffer(b"AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT",
                         dtype=np.uint8)


def phred_profile(rl: int, rng) -> np.ndarray:
    """Mean quality by cycle: high plateau, 3' droop."""
    x = np.arange(rl)
    mean_q = 37.0 - 14.0 * (x / max(rl - 1, 1)) ** 3
    return mean_q


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--genome-bp", type=int, default=4_600_000)
    ap.add_argument("--coverage", type=float, default=40.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--insert", type=int, default=300)
    ap.add_argument("--insert-sd", type=int, default=60)
    ap.add_argument("--short-insert-frac", type=float, default=0.04,
                    help="pairs with insert < read_len (adapter "
                    "read-through)")
    ap.add_argument("--dup-frac", type=float, default=0.02)
    ap.add_argument("--trunc-frac", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=1)
    a = ap.parse_args()

    rng = np.random.default_rng(a.seed)
    os.makedirs(a.outdir, exist_ok=True)
    rl = a.read_len

    genome = BASES[rng.integers(0, 4, a.genome_bp)]
    with open(os.path.join(a.outdir, "genome.fa"), "wb") as fh:
        fh.write(b">genome\n")
        for lo in range(0, len(genome), 80):
            fh.write(genome[lo:lo + 80].tobytes() + b"\n")

    n_pairs = int(a.genome_bp * a.coverage / (2 * rl))

    # coverage skew: windowed log-normal weights
    win = 10_000
    wts = np.exp(rng.normal(0, 0.5, a.genome_bp // win + 1))
    wts /= wts.sum()
    win_id = rng.choice(len(wts), n_pairs, p=wts)
    starts = win_id * win + rng.integers(0, win, n_pairs)

    ins = rng.normal(a.insert, a.insert_sd, n_pairs).astype(np.int64)
    short = rng.random(n_pairs) < a.short_insert_frac
    ins[short] = rng.integers(rl // 2, rl, int(short.sum()))
    ins = np.clip(ins, 40, a.insert + 6 * a.insert_sd)
    starts = np.minimum(starts, a.genome_bp - ins - 1)
    starts = np.maximum(starts, 0)

    mean_q = phred_profile(rl, rng)

    def make_mate(is_r2: bool):
        # fragment coordinates
        frag_len = ins
        if is_r2:
            idx = (starts + frag_len)[:, None] - 1 \
                - np.arange(rl)[None, :]
        else:
            idx = starts[:, None] + np.arange(rl)[None, :]
        # positions past the fragment read into the adapter
        over = np.arange(rl)[None, :] >= frag_len[:, None]
        idx_c = np.clip(idx, 0, a.genome_bp - 1)
        r = genome[idx_c]
        if is_r2:
            r = COMP[r]
        adapter = ADAPTER2 if is_r2 else ADAPTER1
        ad_pos = (np.arange(rl)[None, :] - frag_len[:, None]) \
            % len(adapter)
        r = np.where(over, adapter[ad_pos], r)

        # per-base quality ~ N(mean_q[cycle], 3), floor 2
        q = rng.normal(mean_q[None, :], 3.0, r.shape)
        q = np.clip(q, 2, 41).astype(np.int8)
        # error probability from quality
        perr = 10.0 ** (-q / 10.0)
        err = rng.random(r.shape) < perr
        # low-quality positions may be called N (q==2 -> N)
        is_n = q <= 2
        sub = BASES[rng.integers(0, 4, int(err.sum()))]
        r = r.copy()
        r[err] = sub
        r[is_n] = ord("N")
        qs = (q + 33).astype(np.uint8)
        return r, qs

    r1, q1 = make_mate(False)
    r2, q2 = make_mate(True)

    # duplicates: resample some pairs verbatim
    n_dup = int(a.dup_frac * n_pairs)
    if n_dup:
        src = rng.integers(0, n_pairs, n_dup)
        r1 = np.concatenate([r1, r1[src]])
        q1 = np.concatenate([q1, q1[src]])
        r2 = np.concatenate([r2, r2[src]])
        q2 = np.concatenate([q2, q2[src]])

    # truncated reads: cut a fraction short (written with short seq)
    n_all = len(r1)
    trunc_len = np.full(n_all, rl, np.int64)
    tmask = rng.random(n_all) < a.trunc_frac
    trunc_len[tmask] = rng.integers(35, rl, int(tmask.sum()))

    perm = rng.permutation(n_all)

    def write_fq(path, rr, qq):
        with gzip.open(path, "wb", compresslevel=2) as fh:
            buf = []
            for j, i in enumerate(perm):
                L = trunc_len[i]
                buf.append(b"@r%d\n%s\n+\n%s\n" % (
                    j, rr[i, :L].tobytes(), qq[i, :L].tobytes()))
                if len(buf) >= 20000:
                    fh.write(b"".join(buf))
                    buf = []
            fh.write(b"".join(buf))

    write_fq(os.path.join(a.outdir, "reads_1.fq.gz"), r1, q1)
    write_fq(os.path.join(a.outdir, "reads_2.fq.gz"), r2, q2)
    tot = int(trunc_len.sum()) * 2
    print(f"{n_all} pairs, ~{tot/1e6:.0f} Mbp, adapters in "
          f"{int(short.sum())} pairs, {int(tmask.sum())} truncated "
          f"-> {a.outdir}")


if __name__ == "__main__":
    main()
