import sys, os, json, gzip, tempfile, shutil, subprocess
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import equivalence_study as eq
import numpy as np
from megahit_tpu.core import packing
from megahit_tpu.io.contig_io import read_contigs

def run_one_nolocal(i, seed):
    workdir = tempfile.mkdtemp(prefix=f"equivnl{i}_")
    try:
        rng = np.random.default_rng(seed)
        genomes, r1, r2, klist, preset, err = eq.make_community(rng)
        p1 = os.path.join(workdir, "r1.fa.gz"); p2 = os.path.join(workdir, "r2.fa.gz")
        with gzip.open(p1, "wt") as f1, gzip.open(p2, "wt") as f2:
            for j, (a, b) in enumerate(zip(r1, r2)):
                f1.write(f">p{j}/1\n{a}\n"); f2.write(f">p{j}/2\n{b}\n")
        args = ["-1", p1, "-2", p2, "--k-list", klist, "--min-contig-len", "300", "--no-local"]
        if preset: args += ["--presets", preset]
        ref_out = os.path.join(workdir, "ref"); our_out = os.path.join(workdir, "ours")
        subprocess.run(["python", eq.REF] + args + ["-o", ref_out, "-t", "1"], check=True, capture_output=True)
        from megahit_tpu.__main__ import main
        rc = main(args + ["-o", our_out]); assert rc == 0
        R = {eq.canon(c.codes) for c in read_contigs(os.path.join(ref_out, "final.contigs.fa"))}
        O = {eq.canon(c.codes) for c in read_contigs(os.path.join(our_out, "final.contigs.fa"))}
        print(f"scenario {i} no-local: exact={R==O} ref={len(R)} ours={len(O)} shared={len(R&O)}", flush=True)
        return R == O
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

res = {i: run_one_nolocal(i, 10_000 + i) for i in [2, 4, 5, 18]}
print(json.dumps(res))
