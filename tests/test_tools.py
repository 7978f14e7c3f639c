"""Toolkit: contig2fastg / filterbylen / readstat."""

import io

import numpy as np

from megahit_tpu import tools
from megahit_tpu.core import packing

RNG = np.random.default_rng(13)


def test_contig2fastg_links(tmp_path):
    k = 21
    g = RNG.integers(0, 4, size=300).astype(np.uint8)
    # contig B starts with the last k bases of contig A
    a = packing.decode(g[:150])
    b = packing.decode(g[150 - k : 280])
    p = tmp_path / "k21.contigs.fa"
    p.write_text(
        f">k21_0 flag=0 multi=3.5 len={len(a)}\n{a}\n"
        f">k21_1 flag=0 multi=2.0 len={len(b)}\n{b}\n"
    )
    out = io.StringIO()
    tools.contig2fastg(k, str(p), out=out)
    text = out.getvalue()
    lines = text.splitlines()
    # 2 contigs x 2 orientations
    assert sum(1 for ln in lines if ln.startswith(">")) == 4
    # A links to B: A's header lists B as neighbour
    hdr_a = next(ln for ln in lines
                 if ln.startswith(">NODE_1_") and not ln[1:].startswith(
                     "NODE_1_length_150_cov_3.5000_ID_1'"))
    assert "NODE_2_" in hdr_a
    assert text.count("cov_3.5000") >= 2


def test_filterbylen():
    inp = io.StringIO(
        ">a x\nACGTACGTACGT\n>b y\nACG\n>c z\nACGTACGTACGTACGT\n"
    )
    out, err = io.StringIO(), io.StringIO()
    tools.filterbylen(10, inp=inp, out=out, err=err)
    assert ">a x" in out.getvalue() and ">b y" not in out.getvalue()
    assert "2 contigs" in err.getvalue()
    assert "N50 16" in err.getvalue()


def test_readstat(tmp_path):
    p = tmp_path / "r.fa"
    p.write_text(">x\nACGT\n>y\nACGTACGT\n")
    out = io.StringIO()
    tools.readstat([str(p)], out=out)
    s = out.getvalue()
    assert "number reads: 2" in s and "total size: 12" in s
    assert "longest: 8" in s and "shortest: 4" in s


def test_tools_cli(tmp_path, capsys):
    p = tmp_path / "r.fa"
    p.write_text(">x\nACGT\n")
    assert tools.main(["readstat", str(p)]) == 0
    assert tools.main(["nope"]) == 1
    assert tools.main([]) == 1
