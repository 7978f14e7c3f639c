"""Paired-end local assembly (gap filling).

Reference: src/localasm/local_assemble.cpp RunLocalAssembly - map all
reads to contigs with the sparse seed mapper, estimate insert sizes
from concordant pairs, collect reads hanging off contig ends (plus
stray mates of end-anchored reads), and mini-assemble each contig end's
read set; the `.local.fa` contigs seed the next-k graph.

TPU redesign: mapping is one batched device pass (see mapper.py); the
per-end IDBA runs collapse into one group-batched graph per k (see
mini_asm.py).
"""

from __future__ import annotations

import numpy as np

from ..core import packing
from ..io.contig_io import ContigRecord
from ..io.lib import SequenceLib
from ..utils.log import get_logger
from .mapper import MapResult, SeedIndex, build_seed_index, map_reads
from .mini_asm import mini_assemble

MAX_LOCAL_RANGE = 650  # reference kMaxLocalRange (local_assemble.cpp:25)
MIN_LOCAL_CONTIG = 200  # LocalAsmOption.min_contig_len
LOCAL_KMIN, LOCAL_KMAX, LOCAL_STEP = 11, 41, 6


def estimate_insert_sizes(
    lib: SequenceLib, res: MapResult
) -> list[tuple[float, float]]:
    """Per-library (mean, sd) of insert size from concordant pairs
    (reference EstimateInsertSize, local_assemble.cpp:83-138; 1%
    trimmed)."""
    log = get_logger()
    out = []
    lengths = lib.lengths
    for begin, end, is_paired in lib.lib_ranges:
        if not is_paired:
            out.append((0.0, 0.0))
            continue
        i = np.arange(begin, end - 1, 2)
        j = i + 1
        ok = (res.valid[i] & res.valid[j]
              & (res.contig_id[i] == res.contig_id[j])
              & (res.strand[i] != res.strand[j]))
        i, j = i[ok], j[ok]
        ins = np.where(
            res.strand[i] == 0,
            res.contig_to[j] + lengths[j] - res.query_to[j]
            - (res.contig_from[i] - res.query_from[i]),
            res.contig_to[i] + lengths[i] - res.query_to[i]
            - (res.contig_from[j] - res.query_from[j]),
        )
        ins = ins[(ins >= lengths[i]) & (ins >= lengths[j])]
        if len(ins) == 0:
            out.append((0.0, 0.0))
            continue
        ins = np.sort(ins)
        t = int(len(ins) * 0.01)
        ins = ins[t : len(ins) - t] if len(ins) > 2 * t else ins
        out.append((float(ins.mean()), float(ins.std())))
        log.info("lib [%d,%d): insert size %.2f sd %.2f",
                 begin, end, out[-1][0], out[-1][1])
    return out


def local_range_for(lib_range, lengths, insert_size) -> int:
    """Reference LocalRange (local_assemble.cpp:140-153)."""
    begin, end, is_paired = lib_range
    max_len = int(lengths[begin:end].max()) if end > begin else 0
    lr = max_len - 1
    mean, sd = insert_size
    if is_paired and mean >= max_len:
        lr = int(min(2 * mean, mean + 3 * sd))
    return min(lr, MAX_LOCAL_RANGE)


def collect_mappings(
    lib: SequenceLib,
    res: MapResult,
    insert_sizes,
    contig_lens: np.ndarray,
):
    """Per (contig, side) lists of (abs_pos, is_mate, read_id), sorted.
    side 0 = contig start, side 1 = contig end (reference
    MappingResultCollector AddSingle/AddMate)."""
    lengths = lib.lengths
    n_contigs = len(contig_lens)
    entries: list[list[tuple[int, int, int]]] = [
        [] for _ in range(2 * n_contigs)
    ]

    def add(cid, side, pos, is_mate, rid):
        entries[2 * cid + side].append((int(pos), int(is_mate), int(rid)))

    for li, rng in enumerate(lib.lib_ranges):
        begin, end, is_paired = rng
        lr = local_range_for(rng, lengths, insert_sizes[li])
        ids = np.arange(begin, end)
        v = res.valid[ids]
        for rid in ids[v]:
            cid = res.contig_id[rid]
            cl = contig_lens[cid]
            rl = lengths[rid]
            # AddSingle: read overhangs an end within local range
            if (res.contig_to[rid] < lr and res.query_from[rid] != 0
                    and res.query_to[rid] == rl - 1):
                add(cid, 0, res.contig_to[rid], 0, rid)
            elif (res.contig_from[rid] + lr >= cl
                    and res.query_to[rid] < rl - 1
                    and res.query_from[rid] == 0):
                add(cid, 1, cl - 1 - res.contig_from[rid], 0, rid)
            # AddMate: stray mate of an end-anchored read
            if is_paired:
                mate = rid + 1 if (rid - begin) % 2 == 0 else rid - 1
                if res.valid[mate] and res.contig_id[mate] == cid:
                    continue
                if res.contig_to[rid] < lr and res.strand[rid] == 1:
                    add(cid, 0, res.contig_to[rid], 1, mate)
                elif (res.contig_from[rid] + lr >= cl
                        and res.strand[rid] == 0):
                    add(cid, 1, cl - 1 - res.contig_from[rid], 1, mate)
    for lst in entries:
        lst.sort()
    return entries


def run_local_assembly(
    lib: SequenceLib,
    contigs: list[ContigRecord],
    local_kmax: int = LOCAL_KMAX,
) -> list[ContigRecord]:
    """Full local assembly pass; returns local contig records
    (reference RunLocalAssembly, local_assemble.cpp:306-347)."""
    log = get_logger()
    contig_codes = [c.codes for c in contigs]
    if not contigs or lib.num_seqs == 0:
        return []
    index = build_seed_index(contig_codes)
    res = map_reads(lib.flat_codes, lib.starts, index)
    insert_sizes = estimate_insert_sizes(lib, res)
    contig_lens = np.array([len(c) for c in contig_codes])
    entries = collect_mappings(lib, res, insert_sizes, contig_lens)

    max_read_len = lib.max_len
    max_lr = max(
        (local_range_for(r, lib.lengths, insert_sizes[i])
         for i, r in enumerate(lib.lib_ranges)), default=0,
    )
    min_num_reads = max_lr // max_read_len if max_read_len > 0 else 1

    groups_reads: list[list[np.ndarray]] = []
    contig_ends: list[np.ndarray] = []
    group_meta: list[tuple[int, int]] = []
    for cid, codes in enumerate(contig_codes):
        cl = len(codes)
        for side in (0, 1):
            lst = entries[2 * cid + side]
            if len(lst) <= min_num_reads:
                continue
            reads: list[np.ndarray] = []
            last_pos, pos_count = -1, 0
            for pos, _, rid in lst:
                pos_count = pos_count + 1 if pos == last_pos else 1
                last_pos = pos
                if pos_count <= 3:  # <=3 reads per position (:260-275)
                    reads.append(lib.seq(rid))
            end_len = min(max_lr, cl)
            ce = codes[:end_len] if side == 0 else codes[cl - end_len:]
            groups_reads.append(reads)
            contig_ends.append(ce)
            group_meta.append((cid, side))

    if not groups_reads:
        log.info("local assembly: no eligible contig ends")
        return []
    log.info("local assembly: %d contig ends, %d reads",
             len(groups_reads), sum(map(len, groups_reads)))
    result = mini_assemble(
        groups_reads, contig_ends, LOCAL_KMIN, local_kmax, LOCAL_STEP
    )

    out: list[ContigRecord] = []
    for g, (cid, side) in enumerate(group_meta):
        for j, codes in enumerate(result[g]):
            if len(codes) > MIN_LOCAL_CONTIG and len(codes) > local_kmax:
                out.append(ContigRecord(
                    codes, 0, len(out), 0, 1.0
                ))
    log.info("local assembly: %d local contigs", len(out))
    return out
