"""Reference-oracle helpers: build voutcn/megahit from /root/reference
(read-only) into a temp dir and run its --test pipeline once, so tests can
compare stage-by-stage outputs. Skips gracefully when unavailable."""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

import numpy as np

REF_SRC = Path("/root/reference")
BUILD_DIR = Path("/tmp/refbuild")
TEST_OUT = Path("/tmp/ref_test_out")
TEST_DATA = REF_SRC / "test_data"


def have_reference() -> bool:
    return REF_SRC.is_dir()


def ensure_built() -> Path | None:
    if not have_reference():
        return None
    megahit = BUILD_DIR / "megahit"
    if megahit.exists():
        return BUILD_DIR
    try:
        subprocess.run(
            ["cmake", "-S", str(REF_SRC), "-B", str(BUILD_DIR),
             "-DCMAKE_BUILD_TYPE=Release"],
            check=True, capture_output=True)
        subprocess.run(
            ["cmake", "--build", str(BUILD_DIR), "-j8"],
            check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return BUILD_DIR if megahit.exists() else None


def ensure_test_run() -> Path | None:
    """Run `megahit --test --keep-tmp-files` once; return the output dir."""
    if (TEST_OUT / "final.contigs.fa").exists():
        return TEST_OUT
    build = ensure_built()
    if build is None:
        return None
    # the driver looks for test_data next to the script dir
    link = Path("/tmp/test_data")
    if not link.exists():
        link.symlink_to(TEST_DATA)
    try:
        subprocess.run(
            [str(build / "megahit"), "--test", "-t", "1", "-o",
             str(TEST_OUT), "--keep-tmp-files", "-f"],
            check=True, capture_output=True, timeout=600)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    return TEST_OUT if (TEST_OUT / "final.contigs.fa").exists() else None


def read_edge_file(prefix: Path) -> tuple[np.ndarray, np.ndarray, int]:
    """Decode reference .edges.{i} files -> (codes (N, k+1) uint8, mult, k).

    Record format (reference src/sequence/io/edge/edge_writer.h:37-39,
    kmer_counter.cpp:32-52): words_per_edge uint32 words, 2-bit big-endian
    bases then 16-bit multiplicity in the low bits of the last word.
    NOTE: the reference packs reads REVERSED into its SeqPackage
    (kmer_counter.cpp:61 `is_reverse = true`), so the stored edges are
    reversed strings of (canonicalized) real-world (k+1)-mers.
    """
    info = {}
    for line in open(f"{prefix}.edges.info"):
        parts = line.split()
        if len(parts) == 2 and not parts[0].isdigit():
            info[parts[0]] = parts[1]
    k = int(info["kmer_size"])
    wpe = int(info["words_per_edge"])
    num_files = int(info["num_files"])
    recs = []
    for i in range(num_files):
        f = Path(f"{prefix}.edges.{i}")
        if f.exists() and f.stat().st_size:
            recs.append(np.fromfile(f, dtype=np.uint32).reshape(-1, wpe))
    rec = np.concatenate(recs) if recs else np.zeros((0, wpe), np.uint32)
    mult = (rec[:, -1] & 0xFFFF).astype(np.int32)
    n_bases = k + 1
    shifts = (30 - 2 * np.arange(16, dtype=np.uint32)).astype(np.uint32)
    codes = ((rec[:, :, None] >> shifts) & 3).reshape(len(rec), -1)[
        :, :n_bases
    ].astype(np.uint8)
    return codes, mult, k
