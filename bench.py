"""Benchmark: BAM reads/s/chip through the full getclip + realign + getsv
pipeline on the reference example data, with output parity asserted.

Baseline (BASELINE.md): the reference binaries do getclip (0.032 s) +
getsv (0.058 s) for 16,730 records on one CPU core ~= 1.86e5 reads/s
through the pipeline (realignment excluded there because bwa is a separate
process; it is INCLUDED in our timing, which is conservative in our favor's
opposite direction).

Prints exactly one JSON line.
"""
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EXAMPLE = "/root/reference/example"
BASELINE_READS_PER_S = 16730 / (0.032 + 0.058)


def run_pipeline(tmpdir: str, use_jax_aligner: bool):
    from seeksv_tpu.align.engine import Aligner, BatchAligner
    from seeksv_tpu.io.bam import read_bam
    from seeksv_tpu.pipeline.getclip import getclip
    from seeksv_tpu.pipeline.getsv import getsv

    t0 = time.time()
    recs = read_bam(f"{EXAMPLE}/cancer.sort.bam")
    prefix = os.path.join(tmpdir, "cancer")
    getclip(f"{EXAMPLE}/cancer.sort.bam", prefix, recs=recs)
    cls = BatchAligner if use_jax_aligner else Aligner
    aligner = cls.from_fasta(f"{EXAMPLE}/reference/example.fa")
    import gzip
    seqs, quals = [], []
    with gzip.open(f"{prefix}.clip.fq.gz", "rt") as f:
        while True:
            h = f.readline()
            if not h:
                break
            seqs.append(f.readline().strip().encode())
            f.readline()
            quals.append(f.readline().strip())
    if use_jax_aligner:
        alns = aligner.batch_align(seqs)
    else:
        alns = [aligner.align(s) for s in seqs]
    sam_path = os.path.join(tmpdir, "cancer.clip.sam")
    _write_sam(aligner, seqs, quals, alns, sam_path)
    sv_path = os.path.join(tmpdir, "cancer.sv")
    getsv(sam_path, f"{EXAMPLE}/cancer.sort.bam", f"{prefix}.clip.gz",
          sv_path, os.path.join(tmpdir, "r.fq"), filtered_out=io.StringIO(),
          recs=recs)
    dt = time.time() - t0
    with open(sv_path, "rb") as f, open(f"{EXAMPLE}/cancer.sv", "rb") as g:
        assert f.read() == g.read(), "parity violation in bench run"
    return recs.n, dt


def _write_sam(aligner, seqs, quals, alns, path):
    import numpy as np
    from seeksv_tpu.align.engine import _RC, _cigar_str
    with open(path, "w") as out:
        out.write("@HD\tVN:1.5\tSO:unsorted\n")
        for name, ln in zip(aligner.idx.chrom_names,
                            np.diff(aligner.idx.chrom_starts)):
            out.write(f"@SQ\tSN:{name}\tLN:{int(ln)}\n")
        for seq, qual, a in zip(seqs, quals, alns):
            qn = seq.decode()
            if not a.mapped:
                out.write(f"{qn}\t4\t*\t0\t0\t*\t*\t0\t0\t{qn}\t{qual}\n")
                continue
            oseq, oq = qn, qual
            if a.strand:
                oseq = bytes(_RC[np.frombuffer(seq, np.uint8)][::-1]).decode()
                oq = qual[::-1]
            out.write(f"{qn}\t{16 if a.strand else 0}\t"
                      f"{aligner.idx.chrom_names[a.tid]}\t{a.pos + 1}\t"
                      f"{a.mapq}\t{_cigar_str(a.cigar)}\t*\t0\t0\t{oseq}\t{oq}\n")


def main():
    import tempfile

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/seeksv_tpu_jax"))
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        use_jax = True
    except Exception:
        use_jax = False

    with tempfile.TemporaryDirectory() as d:
        # warmup (jit compile, file cache)
        run_pipeline(d, use_jax)
    best = None
    n = 0
    for _ in range(3):
        with tempfile.TemporaryDirectory() as d:
            n, dt = run_pipeline(d, use_jax)
            best = dt if best is None else min(best, dt)
    value = n / best
    print(json.dumps({
        "metric": "bam_reads_per_s_chip_full_pipeline",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(value / BASELINE_READS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
