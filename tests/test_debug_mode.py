"""MEGAHIT_TPU_DEBUG sanitizer mode (SURVEY §7.9 hardening)."""

import numpy as np
import pytest

from megahit_tpu.core import kmerops, packing
from megahit_tpu.graph.sdbg import build_sdbg
from megahit_tpu.utils.debug import check_sdbg_invariants

RNG = np.random.default_rng(7)


def _graph(k=22, n=400):
    genome = RNG.integers(0, 4, size=n).astype(np.uint8)
    flat, starts = packing.pack_many([genome])
    return build_sdbg(flat, starts, np.ones(1, np.int32), k)


def test_invariants_pass_on_valid_graph():
    check_sdbg_invariants(_graph())


def test_invariants_catch_broken_rc():
    g = _graph()
    g.rc[0], g.rc[1] = g.rc[1], g.rc[0]  # corrupt the pairing
    with pytest.raises(AssertionError):
        check_sdbg_invariants(g)


def test_invariants_catch_broken_candidates():
    g = _graph()
    t = g.oc_t.copy()
    rows = np.flatnonzero(t[:, 0] >= 0)
    if len(rows) == 0:
        pytest.skip("no candidates in toy graph")
    t[rows[0], 0] = (t[rows[0], 0] + 1) % g.real  # point elsewhere
    g._oc_t = t
    with pytest.raises(AssertionError):
        check_sdbg_invariants(g)


def test_debug_env_runs_pipeline(tmp_path, monkeypatch):
    """Full toy assembly with the invariant checks armed."""
    import os

    from megahit_tpu.__main__ import main

    monkeypatch.setenv("MEGAHIT_TPU_DEBUG", "1")
    out = str(tmp_path / "out")
    assert main(["--test", "-o", out, "--no-local",
                 "--k-list", "21,29"]) == 0
    assert os.path.exists(os.path.join(out, "final.contigs.fa"))
