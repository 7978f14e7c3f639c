"""Profile the local-assembly stage standalone on kept artifacts.

Usage:
    python scripts/profile_local.py OUTDIR KCONTIGS [KMAX]

OUTDIR must contain reads.lib.npz (driver artifact); KCONTIGS is an
intermediate contig FASTA (e.g. intermediate_contigs/k21.contigs.fa).
Prints the stage wall, a cProfile top list, and per-phase timers.
"""

import cProfile
import io
import pstats
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    outdir, contigs_fa = sys.argv[1], sys.argv[2]
    kmax = int(sys.argv[3]) if len(sys.argv) > 3 else 41

    from megahit_tpu.io.contig_io import read_contigs
    from megahit_tpu.io.lib import SequenceLib
    from megahit_tpu.localasm.local_assemble import run_local_assembly

    lib = SequenceLib.load(f"{outdir}/reads.lib.npz")
    contigs = read_contigs(contigs_fa)
    print(f"{lib.num_seqs} reads, {len(contigs)} contigs")
    t0 = time.time()
    pr = cProfile.Profile()
    pr.enable()
    out = run_local_assembly(lib, contigs, kmax)
    pr.disable()
    print(f"local stage wall {time.time() - t0:.1f} s, "
          f"{len(out)} local contigs")
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
