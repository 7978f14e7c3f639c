"""Large-graph memory/throughput demonstration (VERDICT r2 item 4).

Builds a ~1e8-edge SdBG out-of-core from a synthetic random genome
(windowed disk pool, bounded rounds) and assembles it, reporting wall
time, maxrss, and resident bytes/edge of the navigation core - the
scale the eager-(E,4)-table design could not hold in the same budget
(~93 B/edge resident vs ~28 B/edge for the run-based core).

Usage: python scripts/big_graph_bench.py [--genome-mbp 50] [--outdir /tmp/biggraph]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mbp", type=float, default=50.0)
    ap.add_argument("--outdir", default="/tmp/biggraph")
    ap.add_argument("--budget-rows", type=int, default=1 << 24)
    a = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from megahit_tpu.graph.bucketed import (BuildStats, PoolSource,
                                            build_sdbg_bucketed)
    from megahit_tpu.io.lib import SequenceLib
    from megahit_tpu.pipeline.assemble import AssembleOptions, assemble

    os.makedirs(a.outdir, exist_ok=True)
    n = int(a.genome_mbp * 1e6)
    rng = np.random.default_rng(0)
    # one random genome; its distinct 22-mers (both strands) ~ 2n edges
    flat = rng.integers(0, 4, n).astype(np.uint8)
    starts = np.array([0, n], dtype=np.int64)
    lib = SequenceLib(flat, starts, [(0, 1, False)])
    lib_path = os.path.join(a.outdir, "lib.npz")
    lib.save(lib_path)
    del lib, flat
    win = SequenceLib.load(lib_path, mode="window")

    def rss_gb():
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    stats = BuildStats()
    t0 = time.time()
    sdbg = build_sdbg_bucketed(
        [PoolSource(win.pool, win.starts, np.ones(1, np.int32))],
        22, a.budget_rows, os.path.join(a.outdir, "spill"),
        stats=stats, mult_mode="count", min_count=1,
    )
    t_build = time.time() - t0
    e = sdbg.num_valid()
    print(f"build: {t_build:.0f}s, {e} edges, "
          f"{stats.total_spilled_rows} spilled rows, "
          f"{stats.n_rounds} rounds, maxrss {rss_gb():.1f} GB")

    t0 = time.time()
    res = assemble(sdbg, AssembleOptions(min_standalone=200))
    t_asm = time.time() - t0
    parts = [sdbg.keys, sdbg.mult, sdbg.valid, sdbg._rc,
             sdbg._run_start, sdbg._nxt_link]
    for extra in (sdbg._rvc, sdbg._ref_rank):
        if extra is not None:
            parts.append(extra)
    per_edge = sum(x.nbytes for x in parts) / max(sdbg.size, 1)
    assert sdbg._oc_t is None, "tables materialized!"
    out = {
        "edges": e,
        "build_s": round(t_build, 1),
        "assemble_s": round(t_asm, 1),
        "contigs": len(res.contigs),
        "maxrss_gb": round(rss_gb(), 2),
        "nav_bytes_per_edge": round(per_edge, 1),
        "spilled_rows": int(stats.total_spilled_rows),
        "rounds": stats.n_rounds,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
