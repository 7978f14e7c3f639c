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
