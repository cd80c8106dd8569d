"""Multi-PROCESS full pipeline (VERDICT r2 item 4; SURVEY.md §2
communication call-out): host-sharded BAM ingest -> per-process getclip
segments -> per-process realignment -> encoded junction-event all-gather
across processes -> partitioned merge -> multi-process coverage+insert ->
chromosome-local discordant counting -> identical sv.txt on process 0.

No process ever reads the whole BAM (each keeps only its chromosome
range from the streaming decode) or the whole clip table (each consumes
only its own getclip segment files).  Sharding is CHROMOSOME-aligned:
the reference's per-chromosome flush (clip_reads.h:423-438) proves
getclip independence at chromosome granularity, and every
discordant-pair window is clamped inside its junction's up-chromosome
(getsv.cpp:1032-1040), so chromosome ownership needs no halos at all —
the mean+4sigma halo machinery is only needed for the sub-chromosome
record sharding of the single-process mesh form
(spmd_pipeline.spmd_discordant_counts_sharded).

Asserted byte-equal to the sequential sv.txt by tests/test_multihost.py
(mode=pipeline worker)."""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..io.bam import BamRecords, concat_records, read_bam_chunks, slice_records
from ..pipeline.getsv import (DepthQuery, DiscordantCounter, JunctionMap,
                              SV_HEADER, insert_junction_event,
                              iter_soft_groups, junction_event,
                              output_breakpoints)
from .spmd_pipeline import (_EncodedEvents, _decode_event, _encode_events,
                            merge_junction_sharded,
                            multiprocess_coverage_insert)

_ENC_FIELDS = ("key", "useq", "dseq", "ulen", "dlen", "ucig", "dcig",
               "meta", "valid")


def _tid_bounds(n_ref: int, nproc: int, pid: int):
    lo = pid * n_ref // nproc
    hi = (pid + 1) * n_ref // nproc
    return lo, hi


def ingest_local(bam: str, pid: int, nproc: int,
                 chunk_records: int = 500_000) -> Optional[BamRecords]:
    """Streaming decode keeping only this process's chromosome range
    (contiguous tids; unplaced tid=-1 records go to the last process).
    Slabs outside the range are dropped immediately — bounded memory,
    no global data visibility."""
    parts: List[BamRecords] = []
    n_ref = None
    for c in read_bam_chunks(bam, chunk_records):
        if n_ref is None:
            n_ref = len(c.ref_names)
            lo, hi = _tid_bounds(n_ref, nproc, pid)
        t = np.asarray(c.tid)
        own = (t >= lo) & (t < hi)
        if pid == nproc - 1:
            own |= t < 0
        # coordinate-sorted: the owned records form one contiguous run;
        # fail loudly (not silently double-count) on an unsorted BAM
        idx = np.nonzero(own)[0]
        if len(idx):
            if not own[int(idx[0]):int(idx[-1]) + 1].all():
                raise ValueError(
                    "BAM is not coordinate-grouped by tid: owned records "
                    "are non-contiguous; multiprocess chromosome sharding "
                    "requires a coordinate-sorted input")
            parts.append(slice_records(c, int(idx[0]), int(idx[-1]) + 1))
    if not parts:
        return None
    return concat_records(parts)


def multiprocess_run_pipeline(mesh, ref_fa: str, bam: str, prefix: str, *,
                              min_mapq: int = 20,
                              read_pair_used: int = 5_000_000,
                              chunk_records: int = 500_000,
                              log=lambda *a: None) -> Optional[str]:
    """Run the full pipeline across jax.distributed processes; returns
    the sv path on process 0 (None on other processes)."""
    import jax
    from jax.experimental import multihost_utils

    from ..pipeline.driver import realign_clips
    from ..pipeline.getclip import GetclipStream

    pid = jax.process_index()
    nproc = jax.process_count()

    # 1. host-sharded ingest (chromosome-aligned contiguous record range)
    local = ingest_local(bam, pid, nproc, chunk_records)
    log(f"[p{pid}] local records: {local.n if local else 0}")

    # 2. per-process getclip segment.  GetclipStream's last_tid starts at
    # 0, so a process whose first owned tid is c>0 reproduces the
    # sequential pass's flush+drop quirk at the 0->c transition exactly
    # (clip_reads.h:423-438: the first mapped record of every tid except
    # an initial tid-0 run is dropped).
    part = f"{prefix}.p{pid}"
    gs = GetclipStream(part)
    if local is not None:
        gs.process(local)
    gs.close()

    # 3. per-process realignment of its own clip segment
    realign_clips(ref_fa, f"{part}.clip.fq.gz", f"{part}.clip.sam")
    log(f"[p{pid}] getclip+realign done")

    # boundary guard: the sequential co-iteration merges ADJACENT equal
    # clipped seqs into one group (getsv.h:472-509); if the seq at a
    # process boundary equals its neighbor's, the split would diverge.
    # Exchange boundary seqs and fail loudly (not silently wrong).
    import gzip
    seqs_edge = [b"", b""]
    with gzip.open(f"{part}.clip.fq.gz", "rb") as f:
        lines = f.read().split(b"\n")
        fq_seqs = [lines[i] for i in range(1, len(lines), 4) if lines[i]]
        if fq_seqs:
            seqs_edge = [fq_seqs[0], fq_seqs[-1]]
    pad = 512
    edge = np.zeros((2, pad), np.uint8)
    for r, s in enumerate(seqs_edge):
        edge[r, :min(len(s), pad)] = np.frombuffer(s[:pad], np.uint8)
    all_edges = np.asarray(multihost_utils.process_allgather(edge))
    for p in range(1, nproc):
        prev_last = all_edges[p - 1, 1]
        cur_first = all_edges[p, 0]
        if prev_last.any() and np.array_equal(prev_last, cur_first):
            raise RuntimeError(
                "identical clipped seq at process boundary "
                f"p{p-1}/p{p}: chromosome-aligned split would diverge "
                "from the sequential group co-iteration")

    # 4. local junction events from this process's clip segment only
    events = []
    rescue_events = []
    for ari, orient, cais in iter_soft_groups(f"{part}.clip.gz",
                                              f"{part}.clip.sam", 0):
        for cai in cais:
            ev = junction_event(ari, orient, cai, False)
            if ev is None:
                continue
            if ev[0] == "rescue":
                rescue_events.append((ev[1], ev[2]))
            else:
                events.append(ev[1:])
    log(f"[p{pid}] {len(events)} junction events")

    # 5. encoded junction-event all-gather across processes
    # (the _EncodedEvents wire format; chromosome ids come from the BAM
    # header so every process encodes identically)
    if local is not None:
        ref_names = local.ref_names
        ref_lens = list(local.ref_lens)
    else:
        for c in read_bam_chunks(bam, 1):
            ref_names = c.ref_names
            ref_lens = list(c.ref_lens)
            break
    name2id = {n: i for i, n in enumerate(ref_names)}
    name2id.setdefault("Exogenous", len(name2id))
    id2name = list(name2id)
    dims = np.asarray([
        max(len(events), 1),
        max((max(len(u.seq), len(d.seq)) for (_j, u, d) in events),
            default=1),
        max((max(len(u.cigar), len(d.cigar), 1) for (_j, u, d) in events),
            default=1)], np.int64)
    all_dims = np.asarray(multihost_utils.process_allgather(dims))
    E, LS, C = (int(all_dims[:, k].max()) for k in range(3))
    enc = _encode_events(events, name2id, E, LS, C)
    gathered = {a: np.asarray(multihost_utils.process_allgather(
        getattr(enc, a))) for a in _ENC_FIELDS}

    # 6. replay in process order (= chromosome order = the sequential
    # clip.gz order) -> ordered junction multimap; partitioned merge
    jmap = JunctionMap()
    for p in range(nproc):
        genc = _EncodedEvents(**{a: gathered[a][p] for a in _ENC_FIELDS})
        for i in range(genc.valid.shape[0]):
            if genc.valid[i]:
                j, up, down = _decode_event(genc, i, id2name)
                insert_junction_event(jmap, j, up, down)
    merge_junction_sharded(jmap, 50)
    log(f"[p{pid}] merged junction table: {len(jmap.items)}")

    # 7. insert-size + coverage across processes (records stay local)
    empty = local is None
    if empty:
        # contribute empty shards (mesh collectives still need all ranks);
        # the reference dictionary must match every other rank's so the
        # genome-flat offsets agree
        local_for_cov = _empty_records(ref_names, ref_lens)
    else:
        local_for_cov = local
    cov, mean, dev = multiprocess_coverage_insert(mesh, local_for_cov,
                                                  min_mapq, read_pair_used)
    log(f"[p{pid}] insert: mean={mean} dev={dev}")

    # 8. discordant pairs: every junction's window lies inside its
    # up-chromosome, so the owner process counts it locally; counts are
    # summed across processes (each junction counted exactly once)
    junctions = [j for j, _ in jmap.items]
    counts = np.zeros(max(len(junctions), 1), np.int64)
    if local is not None and junctions:
        lo, hi = _tid_bounds(len(ref_names), nproc, pid)
        counter = DiscordantCounter(local, min_mapq, mean, dev, 4)
        for i, j in enumerate(junctions):
            t = name2id.get(j[0], -1)
            if lo <= t < hi:
                counts[i] = counter.count(j)
    total_counts = np.asarray(
        multihost_utils.process_allgather(counts)).sum(axis=0)
    for (j, o), c in zip(jmap.items, total_counts):
        o.abnormal = int(c)
    log(f"[p{pid}] discordant done")

    # 9. gather the rescue fastq payloads (virus-mode re-alignment input,
    # ref OutputOneendUnmapBreakpoint getsv.cpp:1252-1288) to process 0
    # in process order (= the sequential emission order)
    parts = []
    for _pos_key, cr in rescue_events:
        if cr.type == "n":
            parts.append(b"@" + cr.clipped_seq + b"\n" + cr.clipped_seq
                         + b"\n+\n" + cr.clipped_qual + b"\n")
    blob = b"".join(parts)
    blen = np.asarray(multihost_utils.process_allgather(
        np.asarray([len(blob)], np.int64))).reshape(-1)
    cap = int(blen.max(initial=0))
    padded = np.zeros(cap, np.uint8)
    if blob:
        padded[:len(blob)] = np.frombuffer(blob, np.uint8)
    allb = (np.asarray(multihost_utils.process_allgather(padded))
            .reshape(nproc, cap) if cap else np.zeros((nproc, 0), np.uint8))

    if pid != 0:
        return None
    # 10. output on process 0 (global coverage is replicated)
    import io
    depth = DepthQuery(_RefView(ref_names, cov), min_mapq, cov=cov)
    with open(f"{prefix}.sv", "w") as fout:
        fout.write(SV_HEADER + "\n")
        output_breakpoints(jmap, depth, 200, 3, 0, 0.1, 50, 50, 30, 1,
                           fout, io.StringIO(), True, 5, 500)
    with open(f"{prefix}.unmapped.clip.fq", "wb") as fq:
        for p in range(nproc):
            fq.write(allb[p, :blen[p]].tobytes())
    log(f"[p0] wrote {prefix}.sv")
    return f"{prefix}.sv"


class _RefView:
    """Minimal recs-like view for DepthQuery when only the reference
    dictionary + coverage are needed."""

    def __init__(self, ref_names, cov):
        self.ref_names = ref_names
        self.ref_lens = [len(cov.get(t, ())) for t in range(len(ref_names))]


def _empty_records(ref_names, ref_lens) -> BamRecords:
    from ..io.bam import BamRecords as BR
    return BR(ref_names=list(ref_names), ref_lens=list(ref_lens),
              n=0, flag=np.zeros(0, np.int32), tid=np.zeros(0, np.int32),
              pos=np.zeros(0, np.int32), mapq=np.zeros(0, np.int32),
              mtid=np.zeros(0, np.int32), mpos=np.zeros(0, np.int32),
              isize=np.zeros(0, np.int32), l_qseq=np.zeros(0, np.int32),
              qnames=[], cig=np.zeros(0, np.uint32),
              cig_off=np.zeros(1, np.int64), seq=np.zeros(0, np.uint8),
              qual=np.zeros(0, np.uint8), seq_off=np.zeros(1, np.int64),
              xc=np.zeros(0, np.int32))


def multiprocess_somatic(mesh, normal_bam: str, tumor_sv: str,
                         out_temp: str, out_final: str, prefix: str, *,
                         min_mapq: int = 20,
                         read_pair_used: int = 5_000_000,
                         chunk_records: int = 500_000,
                         log=lambda *a: None) -> Optional[str]:
    """Distributed tumor/normal subtraction (VERDICT r3 #6): the normal
    BAM is host-sharded exactly like the tumor ingest, each process runs
    getclip on its own normal range and evaluates every tumor sv row
    against its LOCAL clip maps + records, and the per-row
    (nleft, nright, nab) triples are summed across processes — each
    lookup finds nonzero support only on the process owning that
    normal-range position (clip-map probes are single-chromosome
    windows; the discordant window lies inside the up-chromosome,
    getsv.cpp:1032-1040), so the sum equals the sequential pass
    (ref: somatic.cpp:14-427; asserted byte-equal by
    tests/test_multihost.py).  The tumor sv file must be readable by
    every process (shared filesystem or pre-broadcast).

    Returns the final somatic path on process 0, None elsewhere."""
    import jax
    from jax.experimental import multihost_utils

    from ..pipeline.getclip import GetclipStream
    from ..pipeline.somatic import somatic, somatic_filter

    pid = jax.process_index()
    nproc = jax.process_count()

    local = ingest_local(normal_bam, pid, nproc, chunk_records)
    part = f"{prefix}.normal.p{pid}"
    gs = GetclipStream(part)
    if local is not None:
        gs.process(local)
    gs.close()
    log(f"[p{pid}] normal getclip done "
        f"({local.n if local else 0} records)")

    if local is None:
        if pid == nproc - 1:
            raise RuntimeError("last process must at least see the header")
        for c in read_bam_chunks(normal_bam, 1):
            local = _empty_records(c.ref_names, list(c.ref_lens))
            break
    # global first-N insert stats across processes (file order)
    _cov, mean, dev = multiprocess_coverage_insert(mesh, local, min_mapq,
                                                   read_pair_used)
    log(f"[p{pid}] normal insert: mean={mean} dev={dev}")

    triples: list = []
    somatic(normal_bam, f"{part}.clip.gz", tumor_sv, None,
            recs=local, mean_dev=(mean, dev),
            read_pair_used=read_pair_used, collect_triples=triples)
    arr = np.asarray(triples, np.int64).reshape(-1, 3) if triples \
        else np.zeros((0, 3), np.int64)
    total = np.asarray(
        multihost_utils.process_allgather(arr)).sum(axis=0)
    log(f"[p{pid}] somatic triples combined ({arr.shape[0]} rows)")

    if pid != 0:
        return None
    somatic(normal_bam, None, tumor_sv, out_temp,
            use_triples=total, read_pair_used=read_pair_used)
    somatic_filter(out_temp, out_final)
    log(f"[p0] wrote {out_final}")
    return out_final
