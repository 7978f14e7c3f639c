"""Regressions for the round-4 advisor findings (ADVICE.md r4)."""

import threading

import numpy as np
import pytest


def _run_with_deadline(fn, seconds):
    """Run fn in a thread; fail the test if it doesn't finish."""
    box = {}

    def worker():
        try:
            box["result"] = fn()
        except BaseException as e:  # propagated to the assertion below
            box["error"] = e

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    t.join(seconds)
    assert not t.is_alive(), f"deadlocked (> {seconds}s)"
    if "error" in box:
        raise box["error"]
    return box.get("result")


class TestFastxEarlyExitNoDeadlock:
    """ADVICE medium (fastx.py): malformed input that breaks the
    chunked-parse loop early must not deadlock on the prefetch
    thread's bounded queue put."""

    def test_malformed_multichunk_file_returns(self, tmp_path):
        from megahit_tpu import native
        from megahit_tpu.io.fastx import read_fastx_flat

        if native.get_lib() is None:
            pytest.skip("native lib unavailable")
        p = tmp_path / "junk.bin"
        # non-FASTA bytes spanning many chunks at chunk_bytes=1024
        p.write_bytes(b"\x00\x01\x02garbage-not-fastx\xff" * 8192)

        def call():
            try:
                return read_fastx_flat(str(p), chunk_bytes=1024)
            except Exception:
                return None  # raising is fine; hanging is not

        _run_with_deadline(call, 60)

    def test_raw_chunks_generator_close_joins(self, tmp_path):
        from megahit_tpu.io.fastx import _raw_chunks

        p = tmp_path / "big.bin"
        p.write_bytes(b"x" * (1 << 20))

        def call():
            gen = _raw_chunks(str(p), chunk=1024)
            next(gen)  # reader thread now blocks on the full queue
            gen.close()  # finally-join must not deadlock
            return True

        assert _run_with_deadline(call, 30)

    def test_well_formed_chunked_parse_unchanged(self, tmp_path):
        from megahit_tpu.io.fastx import read_fastx_flat

        p = tmp_path / "ok.fa"
        recs = [f">r{i}\n{'ACGT' * 50}\n" for i in range(200)]
        p.write_text("".join(recs))
        codes, starts = read_fastx_flat(str(p), chunk_bytes=1024)
        assert len(starts) == 201
        assert starts[-1] == 200 * 200


class TestDeviceDepthInt32:
    """ADVICE medium (assemble_device.py): device depth must stay
    exact past 2^24 (now int32), and the pipeline must fall back to
    host cleaning when the sound 2^31 bound can't be proven."""

    def test_refresh_depth_exact_above_f32_limit(self):
        # direct kernel-level check: an int32 segment-sum of mults
        # whose total exceeds 2^24 must come back exact (the old f32
        # accumulation loses low bits here)
        import jax.numpy as jnp

        e = 300
        mult = np.full(e, 65535, np.int32)
        mult[0] = 2 ** 24 - 1  # partial sums straddle 2^24
        seg = np.zeros(e, np.int32)  # one chain
        acc = jnp.zeros(e + 1, jnp.int32).at[jnp.asarray(seg)].add(
            jnp.asarray(mult))[:e]
        expect = int(mult.astype(np.int64).sum())
        assert expect > 2 ** 24
        assert int(np.asarray(acc)[0]) == expect
        # and the f32 path really would have been wrong (guards
        # against this test going vacuous)
        f32 = jnp.zeros(e + 1, jnp.float32).at[jnp.asarray(seg)].add(
            jnp.asarray(mult).astype(jnp.float32))[:e]
        assert int(np.asarray(f32)[0]) != expect

    def test_upload_static_mult_is_int32(self):
        from megahit_tpu.graph import assemble_device as ad

        src = ad._upload_static.__wrapped__ if hasattr(
            ad._upload_static, "__wrapped__") else ad._upload_static
        import inspect

        text = inspect.getsource(src)
        assert "int32" in text and "float32" not in text.split(
            "mult=")[1].split("\n")[0]


def test_mapper_dedup_guards_wide_rid():
    """ADVICE low (mapper.py): rid >= 2^31 must not alias candidates
    through the 32-bit native sort key; the lexsort fallback keeps
    them distinct."""
    from megahit_tpu.localasm import mapper as M

    src = open(M.__file__).read()
    assert "ka.max(initial=0) < (1 << 32)" in src


def test_bench_fallback_contract_value_is_zero():
    """ADVICE low (bench.py): when no live attempt succeeded, the
    driver-contract fields must carry 0.0, not a stale historical
    number."""
    import re

    src = open("bench.py").read()
    m = re.search(r"diag = \{(.*?)\}", src, re.S)
    assert m, "fallback diag block missing"
    block = m.group(1)
    assert '"value": 0.0' in block
    assert '"vs_baseline": 0.0' in block


def test_seedscan_wide_transform_is_loud():
    """ADVICE low (seedscan.cpp): W>16 transform_rows must not return
    the input unchanged (silent identity)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "..",
                        "megahit_tpu", "native", "seedscan.cpp")
    src = open(path).read()
    guard = src.split("if (W > 16)")[1].split("}")[0]
    assert "out[i] = keys[i]" not in guard
