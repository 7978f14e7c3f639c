"""Paired-end local assembly (gap filling).

Reference: src/localasm/local_assemble.cpp - map reads to contig ends
with a sparse seed index, collect end-anchored reads and stray mates,
then run a small multi-k mini-assembly per contig end and emit
`.local.fa` contigs that seed the next-k graph.

This is currently a stub returning no local contigs (the pipeline is
correct without it - local assembly only improves contiguity). The full
mapper + mini-assembler lands with the localasm milestone.
"""

from __future__ import annotations

from ..io.contig_io import ContigRecord
from ..io.lib import SequenceLib
from ..utils.log import get_logger


def run_local_assembly(
    lib: SequenceLib,
    contigs: list[ContigRecord],
    local_kmax: int,
) -> list[ContigRecord]:
    get_logger().info(
        "local assembly: stub (0 local contigs from %d contigs)",
        len(contigs),
    )
    return []
