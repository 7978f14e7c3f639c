"""True multi-process jax.distributed test (SURVEY SS4's prescription):
two CPU processes, two virtual devices each, one global 4-device mesh.

Each worker runs the mesh counter and the distributed sample sorter on
identical inputs; worker 0 writes its results, which must match the
single-process single-device reference computed in the parent.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")

port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
from megahit_tpu.parallel.multihost import init_distributed

init_distributed(
    coordinator=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.devices()

import numpy as np
from megahit_tpu.core import packing
from megahit_tpu.parallel.multihost import global_shard_mesh
from megahit_tpu.parallel.shuffle import (
    sharded_count_kmers, sharded_sort_kmers,
)

rng = np.random.default_rng(11)
reads = [rng.integers(0, 4, size=90).astype(np.uint8)
         for _ in range(48)]
flat, starts = packing.pack_many(reads)
mesh = global_shard_mesh()
keys, counts = sharded_count_kmers(flat, starts, 22, 1, mesh)

skeys = rng.integers(0, 2**32, (1000, 2)).astype(np.uint32)
sorted_keys = sharded_sort_kmers(skeys, mesh)

if pid == 0:
    np.savez(os.path.join(outdir, "result.npz"),
             keys=keys, counts=counts, sorted_keys=sorted_keys)
print("WORKER_DONE", pid, flush=True)
"""


def test_two_process_mesh_counter_and_sorter(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = 17645
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(i),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"WORKER_DONE {i}" in out

    z = np.load(tmp_path / "result.npz")

    # single-process reference
    from megahit_tpu.core import packing
    from megahit_tpu.graph import counter

    rng = np.random.default_rng(11)
    reads = [rng.integers(0, 4, size=90).astype(np.uint8)
             for _ in range(48)]
    flat, starts = packing.pack_many(reads)
    ref_keys, ref_counts = counter.count_canonical_kmers(
        flat, starts, 22, min_count=1
    )
    np.testing.assert_array_equal(z["keys"], ref_keys)
    np.testing.assert_array_equal(z["counts"], ref_counts)

    skeys = rng.integers(0, 2**32, (1000, 2)).astype(np.uint32)
    order = np.lexsort((skeys[:, 1], skeys[:, 0]))
    np.testing.assert_array_equal(z["sorted_keys"], skeys[order])


PIPELINE_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")

port, pid, outdir, reads1, reads2 = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
from megahit_tpu.parallel.multihost import init_distributed

init_distributed(
    coordinator=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2 and jax.device_count() == 4

from megahit_tpu.__main__ import main

rc = main([
    "-1", reads1, "-2", reads2, "-o", os.path.join(outdir, f"p{pid}"),
    "--k-list", "21,41", "--no-local", "--mesh", "--platform", "cpu",
])
assert rc == 0
print("WORKER_DONE", pid, flush=True)
"""


def test_two_process_full_pipeline(tmp_path):
    """VERDICT round-2 item 5: the FULL pipeline across 2
    jax.distributed processes with the mesh spanning both; contigs
    must be identical to a single-process run."""
    from megahit_tpu.core import packing

    rng = np.random.default_rng(31)
    genome = rng.integers(0, 4, size=12_000).astype(np.uint8)
    r1 = tmp_path / "r1.fa"
    r2 = tmp_path / "r2.fa"
    with open(r1, "w") as f1, open(r2, "w") as f2:
        i = 0
        for s in range(0, len(genome) - 300, 9):
            fwd = genome[s:s + 100]
            mate = packing.revcomp_codes(genome[s + 200:s + 300])
            f1.write(f">a{i}\n{packing.decode(fwd)}\n")
            f2.write(f">b{i}\n{packing.decode(mate)}\n")
            i += 1

    script = tmp_path / "pipeline_worker.py"
    script.write_text(PIPELINE_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), "17646", str(i),
             str(tmp_path), str(r1), str(r2)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        assert f"WORKER_DONE {i}" in out

    # single-process reference (no mesh)
    from megahit_tpu.__main__ import main

    ref = tmp_path / "ref"
    rc = main(["-1", str(r1), "-2", str(r2), "-o", str(ref),
               "--k-list", "21,41", "--no-local", "--platform", "cpu"])
    assert rc == 0
    ref_fa = (ref / "final.contigs.fa").read_bytes()
    for pid in range(2):
        got = (tmp_path / f"p{pid}" / "final.contigs.fa").read_bytes()
        assert got == ref_fa, f"process {pid} contigs differ"
    assert len(ref_fa) > 1000
