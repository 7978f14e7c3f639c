"""megahit_tpu: a TPU-native metagenome assembler.

A from-scratch rebuild of the capabilities of MEGAHIT (voutcn/megahit) on the
succinct-de-Bruijn-graph method, redesigned for TPU hardware:

- 2-bit packed sequences and fixed-width multi-word k-mer keys as ``uint32``
  lane arrays (reference: ``src/sequence/kmer.h``, ``sequence_package.h``).
- The external-memory bucket-radix-sort engine ("CX1", reference
  ``src/sorting/base_engine.cpp``) is replaced by device-resident multi-word
  sorts (``jax.lax.sort`` / Pallas radix) over static-shape key arrays.
- The BWT-style succinct graph with rank/select navigation (reference
  ``src/sdbg/sdbg.h``) is replaced by sorted k-mer key arrays plus
  precomputed 4-way neighbour-candidate index tables: all graph navigation
  becomes whole-frontier gathers - no per-edge select chains, no dummy-$
  rows, no locks.
- Lock-free unitig construction (reference ``src/assembly/unitig_graph.cpp``)
  becomes deterministic parallel pointer-doubling (list ranking).

Package layout:
  core/     packing, k-mer ops, multi-word sort/search primitives
  io/       FASTA/FASTQ reading, sequence libraries, contig I/O
  graph/    k-mer counting, SdBG construction, unitigs, graph cleaning
  pipeline/ multi-k driver, options, checkpointing
  parallel/ device-mesh sharded builds (bucket sharding + all_to_all)
  utils/    logging, timers, histograms
"""

__version__ = "0.1.0"


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (analogous to the reference
    shipping precompiled binaries: the work is paid once per machine,
    not once per run). A cold accelerator run otherwise recompiles
    ~55 jitted kernels (~150 s measured on the assemble stage alone).
    MEGAHIT_TPU_COMPILE_CACHE overrides the location; "0" disables."""
    import os

    d = os.environ.get(
        "MEGAHIT_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "megahit_tpu",
                     "xla"),
    )
    if not d or d == "0":
        return
    try:
        import jax

        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.3)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization, never a requirement
        pass


_enable_compile_cache()
