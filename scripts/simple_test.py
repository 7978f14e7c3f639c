"""The reference's `make simple_test` scenario matrix for megahit_tpu.

Mirrors /root/reference/CMakeLists.txt:104-116 (9 scenarios):
  1. --test -t 2
  2. MEGAHIT_NUM_MERCY_FACTOR=1.5 --test -t 4 --mem-flag 0 --no-hw-accel
  3. --test -t 2 --kmin-1pass --prune-level 3 --prune-depth 0
  4. random 300bp reads, --k-list 255 --min-count 1
  5. --test -t 2 --mem-flag 2 --keep-tmp-files
  6. empty input
  7. input yielding no contigs
  8. contig2fastg over scenario 5's k59 contigs
  9. readstat over the same

Usage: python scripts/simple_test.py [WORKDIR]
Exits non-zero on the first failing scenario.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEST_DATA = "/root/reference/test_data"


def run(args, env_extra=None, cwd=REPO):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    r = subprocess.run([sys.executable, "-m"] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=1200)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-2000:])
        raise SystemExit(f"FAILED: {' '.join(args)} rc={r.returncode}")
    return r


def expect(cond, what):
    if not cond:
        raise SystemExit(f"FAILED check: {what}")
    print(f"  ok: {what}")


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="simple_test_")
    os.makedirs(work, exist_ok=True)
    mh = ["megahit_tpu"]

    print("[1/9] --test -t 2")
    out = f"{work}/t1"
    shutil.rmtree(out, ignore_errors=True)
    run(mh + ["--test", "-t", "2", "-o", out])
    expect(os.path.getsize(f"{out}/final.contigs.fa") > 0, "contigs")

    print("[2/9] mercy-factor env + --mem-flag 0 --no-hw-accel")
    out = f"{work}/t2"
    shutil.rmtree(out, ignore_errors=True)
    run(mh + ["--test", "-t", "4", "--mem-flag", "0",
              "--no-hw-accel", "-o", out],
        env_extra={"MEGAHIT_NUM_MERCY_FACTOR": "1.5"})
    expect(os.path.getsize(f"{out}/final.contigs.fa") > 0, "contigs")

    print("[3/9] --kmin-1pass --prune-level 3 --prune-depth 0")
    out = f"{work}/t3"
    shutil.rmtree(out, ignore_errors=True)
    run(mh + ["--test", "-t", "2", "--kmin-1pass", "--prune-level",
              "3", "--prune-depth", "0", "-o", out])
    expect(os.path.getsize(f"{out}/final.contigs.fa") > 0, "contigs")

    print("[4/9] single-k 255 over random reads")
    import random

    random.seed(10086)
    rnd = f"{work}/random.fa"
    with open(rnd, "w") as fh:
        for i in range(1000):
            fh.write(">{}\n{}\n".format(
                i + 1,
                "".join("ACGT"[random.randint(0, 3)]
                        for _ in range(300))))
    out = f"{work}/t4"
    shutil.rmtree(out, ignore_errors=True)
    run(mh + ["-r", rnd, "--k-list", "255", "--min-count", "1",
              "-o", out])
    expect(os.path.exists(f"{out}/final.contigs.fa"), "completes")

    print("[5/9] --mem-flag 2 --keep-tmp-files")
    out5 = f"{work}/t5"
    shutil.rmtree(out5, ignore_errors=True)
    run(mh + ["--test", "-t", "2", "--mem-flag", "2",
              "--keep-tmp-files", "-o", out5])
    expect(os.path.isdir(f"{out5}/tmp"), "tmp kept")

    print("[6/9] empty input")
    out = f"{work}/t6"
    shutil.rmtree(out, ignore_errors=True)
    run(mh + ["-r", f"{TEST_DATA}/empty.fa", "-o", out])
    expect(os.path.exists(f"{out}/final.contigs.fa"), "completes")

    print("[7/9] input yielding no contigs")
    out = f"{work}/t7"
    shutil.rmtree(out, ignore_errors=True)
    run(mh + ["-r", f"{TEST_DATA}/r4.fa", "-o", out])
    expect(os.path.exists(f"{out}/final.contigs.fa"), "completes")

    print("[8/9] contig2fastg")
    kfa = None
    for k in ("k59", "k79", "k99", "k119", "k141", "k41", "k21"):
        p = f"{out5}/intermediate_contigs/{k}.contigs.fa"
        if os.path.exists(p) and os.path.getsize(p) > 0:
            kfa = (k, p)
    expect(kfa is not None, "an intermediate contig file exists")
    k, p = kfa
    r = run(["megahit_tpu.tools", "contig2fastg", k[1:], p])
    expect(r.stdout.startswith(">"), "fastg output")

    print("[9/9] readstat")
    r = subprocess.run(
        [sys.executable, "-m", "megahit_tpu.tools", "readstat"],
        stdin=open(p), capture_output=True, text=True, cwd=REPO)
    expect(r.returncode == 0 and "number of reads" in r.stdout.lower()
           or "reads" in r.stdout.lower(), "readstat output")

    print(f"ALL 9 SCENARIOS PASSED ({work})")


if __name__ == "__main__":
    main()
