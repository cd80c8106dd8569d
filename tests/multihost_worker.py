"""Worker process for the 2-process jax.distributed multi-host test
(tests/test_multihost.py): each process ingests only ITS half of the BAM
records (host-sharded file ingest), builds global arrays with
jax.make_array_from_process_local_data, and runs the real
coverage+insert-size shard_map step
(parallel.spmd_pipeline.multiprocess_coverage_insert).  Process 0 also
computes the sequential whole-file answer and asserts equality.

Usage: python multihost_worker.py <pid> <nproc> <port> <bam> [mode] [args]
  mode "covins"  (default): coverage+insert step only
  mode "pipeline": the FULL pipeline (parallel.multiproc) — needs
    <ref_fa> <workdir> after the mode; process 0 also runs the
    sequential pipeline and asserts byte-equal sv.txt.
"""
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    bam = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "covins"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from seeksv_tpu.io.bam import (concat_records, read_bam,
                                   read_bam_chunks, slice_records)
    from seeksv_tpu.parallel.spmd_pipeline import multiprocess_coverage_insert

    assert jax.process_count() == nproc, jax.process_count()

    if mode == "somatic":
        # distributed tumor/normal subtraction: <bam> is the NORMAL BAM,
        # sharded by chromosome range; every process evaluates the tumor
        # sv rows against its local normal clip maps + records and the
        # triples are summed (parallel.multiproc.multiprocess_somatic)
        tumor_sv, workdir = sys.argv[6], sys.argv[7]
        from seeksv_tpu.parallel.multiproc import multiprocess_somatic
        n_dev = jax.device_count()
        devs = np.array(jax.devices()).reshape(n_dev, 1)
        mesh = Mesh(devs, ("dp", "gp"))
        out = multiprocess_somatic(
            mesh, bam, tumor_sv, f"{workdir}/mp.temp.sv",
            f"{workdir}/mp.somatic.sv", f"{workdir}/mp",
            log=lambda *a: print(*a, flush=True))
        if pid == 0:
            from seeksv_tpu.pipeline.getclip import getclip
            from seeksv_tpu.pipeline.somatic import somatic, somatic_filter
            getclip(bam, f"{workdir}/seqn")
            somatic(bam, f"{workdir}/seqn.clip.gz", tumor_sv,
                    f"{workdir}/seq.temp.sv")
            somatic_filter(f"{workdir}/seq.temp.sv",
                           f"{workdir}/seq.somatic.sv")
            for got_p, want_p in ((f"{workdir}/mp.temp.sv",
                                   f"{workdir}/seq.temp.sv"),
                                  (out, f"{workdir}/seq.somatic.sv")):
                got = open(got_p, "rb").read()
                want = open(want_p, "rb").read()
                assert got == want, f"somatic diverges: {got_p}\n" \
                    + got.decode()[:1500] + "\n----\n" + want.decode()[:1500]
            print("MULTIHOST_SOMATIC_OK", flush=True)
        else:
            print(f"[{pid}] somatic done", flush=True)
        return
    if mode == "somatic_range":
        # sub-chromosome RANGE-sharded somatic: flat-genome cuts land
        # mid-chromosome; clip-line halo exchange + per-side ownership
        # masks (parallel.multiproc.multiprocess_somatic_range)
        tumor_sv, workdir = sys.argv[6], sys.argv[7]
        from seeksv_tpu.parallel.multiproc import multiprocess_somatic_range
        n_dev = jax.device_count()
        devs = np.array(jax.devices()).reshape(n_dev, 1)
        mesh = Mesh(devs, ("dp", "gp"))
        out = multiprocess_somatic_range(
            mesh, bam, tumor_sv, f"{workdir}/mpr.temp.sv",
            f"{workdir}/mpr.somatic.sv", f"{workdir}/mpr",
            log=lambda *a: print(*a, flush=True))
        if pid == 0:
            from seeksv_tpu.pipeline.getclip import getclip
            from seeksv_tpu.pipeline.somatic import somatic, somatic_filter
            getclip(bam, f"{workdir}/seqn")
            somatic(bam, f"{workdir}/seqn.clip.gz", tumor_sv,
                    f"{workdir}/seqr.temp.sv")
            somatic_filter(f"{workdir}/seqr.temp.sv",
                           f"{workdir}/seqr.somatic.sv")
            for got_p, want_p in ((f"{workdir}/mpr.temp.sv",
                                   f"{workdir}/seqr.temp.sv"),
                                  (out, f"{workdir}/seqr.somatic.sv")):
                got = open(got_p, "rb").read()
                want = open(want_p, "rb").read()
                assert got == want, f"somatic_range diverges: {got_p}\n" \
                    + got.decode()[:1500] + "\n----\n" + want.decode()[:1500]
            print("MULTIHOST_SOMATIC_RANGE_OK", flush=True)
        else:
            print(f"[{pid}] somatic_range done", flush=True)
        return
    if mode == "pipeline":
        ref_fa, workdir = sys.argv[6], sys.argv[7]
        from seeksv_tpu.parallel.multiproc import multiprocess_run_pipeline
        n_dev = jax.device_count()
        devs = np.array(jax.devices()).reshape(n_dev, 1)
        mesh = Mesh(devs, ("dp", "gp"))
        sv = multiprocess_run_pipeline(
            mesh, ref_fa, bam, f"{workdir}/mp",
            log=lambda *a: print(*a, flush=True))
        if pid == 0:
            import io
            from seeksv_tpu.pipeline.driver import run_pipeline
            run_pipeline(ref_fa, bam, f"{workdir}/seq",
                         filtered_out=io.StringIO())
            got = open(sv, "rb").read()
            want = open(f"{workdir}/seq.sv", "rb").read()
            assert got == want, "multi-process sv.txt diverges:\n" \
                + got.decode()[:2000] + "\n----\n" + want.decode()[:2000]
            print("MULTIHOST_PIPELINE_OK", len(got.splitlines()), flush=True)
        else:
            print(f"[{pid}] pipeline done", flush=True)
        return
    n_dev = jax.device_count()
    assert n_dev == nproc * 2, n_dev

    # host-sharded ingest: this process decodes only its contiguous record
    # range via the chunked reader (drops the other processes' slabs
    # immediately — no global data visibility)
    total = sum(c.n for c in read_bam_chunks(bam, 4000))
    lo = pid * total // nproc
    hi = (pid + 1) * total // nproc
    parts = []
    seen = 0
    for c in read_bam_chunks(bam, 4000):
        c_lo, c_hi = seen, seen + c.n
        seen = c_hi
        s, e = max(lo, c_lo), min(hi, c_hi)
        if s < e:
            parts.append(slice_records(c, s - c_lo, e - c_lo))
    # concatenate this process's slabs into one local BamRecords
    local = concat_records(parts)

    devs = np.array(jax.devices()).reshape(n_dev, 1)
    mesh = Mesh(devs, ("dp", "gp"))
    cov, mean, dev = multiprocess_coverage_insert(mesh, local, 20, 5_000_000)

    if pid == 0:
        from seeksv_tpu.pipeline.getsv import (calculate_insert_size,
                                               compute_coverage)
        whole = read_bam(bam)
        e_mean, e_dev = calculate_insert_size(whole, 20, 5_000_000)
        assert (mean, dev) == (e_mean, e_dev), ((mean, dev), (e_mean, e_dev))
        e_cov = compute_coverage(whole, 20)
        for t in e_cov:
            assert np.array_equal(cov[t], e_cov[t]), f"coverage tid {t}"
        print("MULTIHOST_OK", mean, dev, flush=True)
    else:
        print(f"[{pid}] done", flush=True)


if __name__ == "__main__":
    main()
