"""Regressions for the round-1 advisor findings (ADVICE.md)."""

import numpy as np
import pytest

from megahit_tpu import native
from megahit_tpu.core import packing


def _parse_both(data: bytes, trim_n=True):
    """Native parse + Python-fallback parse of the same buffer."""
    from megahit_tpu.io.fastx import _iter_fastx_bytes, trim_n as tn

    nat = native.parse_fastx_buffer_flat(data, trim_n=trim_n)
    seqs = []
    for rec in _iter_fastx_bytes(data):
        s = tn(rec.seq) if trim_n else rec.seq
        seqs.append(packing.encode(s))
    py = packing.pack_many(seqs)
    return nat, py


class TestTruncatedFastx:
    """ADVICE high: OOB read in fastx_parse on truncated FASTQ
    (negative memchr length wrapped to huge size_t)."""

    def test_fastq_no_trailing_newline(self):
        data = b"@r1\nACGT\n+\nIIII\n@r2\nGGCC\n+\nIIII"
        nat, py = _parse_both(data)
        assert nat is not None
        np.testing.assert_array_equal(nat[0], py[0])
        np.testing.assert_array_equal(nat[1], py[1])

    def test_fastq_header_at_eof(self):
        # header line with no sequence after it, no trailing newline
        data = b"@r1\nACGT\n+\nIIII\n@r2"
        nat = native.parse_fastx_buffer_flat(data)
        if nat is None:
            pytest.skip("native lib unavailable")
        codes, starts = nat
        # first record parsed; truncated record is 0-length or absent
        np.testing.assert_array_equal(
            codes[starts[0]:starts[1]], packing.encode(b"ACGT")
        )
        assert starts[-1] == 4

    def test_fastq_seq_line_at_eof(self):
        data = b"@r1\nACGT"
        nat = native.parse_fastx_buffer_flat(data)
        if nat is None:
            pytest.skip("native lib unavailable")
        codes, starts = nat
        np.testing.assert_array_equal(codes, packing.encode(b"ACGT"))

    def test_fastq_missing_qual(self):
        data = b"@r1\nACGT\n+"
        nat = native.parse_fastx_buffer_flat(data)
        if nat is None:
            pytest.skip("native lib unavailable")
        codes, starts = nat
        np.testing.assert_array_equal(
            codes[starts[0]:starts[1]], packing.encode(b"ACGT")
        )

    def test_fasta_no_trailing_newline(self):
        data = b">a\nACGT\n>b\nGG"
        nat, py = _parse_both(data)
        assert nat is not None
        np.testing.assert_array_equal(nat[0], py[0])
        np.testing.assert_array_equal(nat[1], py[1])

    def test_fasta_header_at_eof(self):
        data = b">a\nACGT\n>b"
        nat = native.parse_fastx_buffer_flat(data)
        if nat is None:
            pytest.skip("native lib unavailable")
        codes, starts = nat
        np.testing.assert_array_equal(
            codes[starts[0]:starts[1]], packing.encode(b"ACGT")
        )


def test_mismatched_pair_files_raise(tmp_path):
    """ADVICE low: -1/-2 with different read counts must error, not
    silently drop tail reads."""
    from megahit_tpu.io.lib import build_lib

    p1 = tmp_path / "r1.fa"
    p2 = tmp_path / "r2.fa"
    p1.write_text(">a\nACGTACGT\n>b\nGGGGCCCC\n")
    p2.write_text(">a\nACGTACGT\n")
    with pytest.raises(ValueError, match="different read counts"):
        build_lib([str(p1)], [str(p2)], [], [])


def test_sharded_counter_clips_kmax_mul_and_retries_on_skew():
    """ADVICE low: --mesh path must clamp multiplicities to kMaxMul.
    A poly-A pool also routes EVERY k-mer to one hash owner, which
    overflows the per-destination capacity and exercises the
    guaranteed-capacity retry (ADVICE medium: capacity sizing)."""
    import jax
    from jax.sharding import Mesh

    from megahit_tpu.graph.counter import KMAX_MUL
    from megahit_tpu.parallel.shuffle import sharded_count_kmers

    k1 = 22
    n_bases = KMAX_MUL + k1 + 64  # one k-mer, count > KMAX_MUL
    flat = np.zeros(n_bases, dtype=np.uint8)
    starts = np.array([0, n_bases], dtype=np.int64)
    mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
    keys, counts = sharded_count_kmers(flat, starts, k1, 1, mesh)
    assert len(keys) == 1
    assert counts[0] == KMAX_MUL


def test_sharded_counter_capacity_scales_with_devices():
    """ADVICE medium: per-(src,dst) capacity must derive from the
    per-device row count, not the global count."""
    import jax
    from jax.sharding import Mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    import jax.numpy as jnp

    from megahit_tpu.parallel.shuffle import make_sharded_counter

    mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
    k1 = 22
    step = make_sharded_counter(mesh, k1)
    n = 8 * 512
    packed = jnp.zeros(64, jnp.uint32)
    shard = NamedSharding(mesh, P("shard"))
    pos = jax.device_put(
        jnp.zeros(n, jnp.int32), shard
    )
    val = jax.device_put(jnp.zeros(n, dtype=bool), shard)
    skeys, counts, head, n_over = step(packed, pos, val)
    # capacity = ceil(512 * 2.0 / 8) = 128 per (src, dst) pair; the
    # received buffer per device is n_dev * capacity = 1024 rows
    assert skeys.shape[:2] == (8, 8 * 128)
