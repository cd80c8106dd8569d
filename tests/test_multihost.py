"""2-process jax.distributed multi-host simulation (SURVEY.md §4
implication / §2 communication call-out): host-sharded BAM ingest ->
jax.make_array_from_process_local_data -> the real coverage+insert-size
shard_map step, with NO process ever holding the whole file — asserted
equal to the sequential single-process result.

The workers run in separate python processes (tests/multihost_worker.py)
coordinated over a local TCP port with gloo CPU collectives; this is the
same initialization path a real multi-host TPU pod uses
(jax.distributed.initialize), minus the hardware."""
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")
CANCER = "/root/reference/example/cancer.sort.bam"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(extra_args, ok_token, timeout=420, bam=CANCER):
    port = _free_port()
    env = dict(os.environ)
    # the workers pick their own platform/device config in-process
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), bam]
        + extra_args,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    assert ok_token in outs[0], outs[0][-3000:]


def test_two_process_coverage_insert_equals_sequential():
    _run_workers([], "MULTIHOST_OK")


def test_two_process_full_pipeline_sv_byte_equal(tmp_path):
    """Host-sharded ingest -> per-process getclip -> junction-event
    all-gather -> partitioned merge -> multi-process coverage+insert ->
    chromosome-local discordant -> byte-equal sv.txt, with no process
    reading the whole BAM or clip table (VERDICT r2 item 4)."""
    _run_workers(
        ["pipeline", "/root/reference/example/reference/example.fa",
         str(tmp_path)], "MULTIHOST_PIPELINE_OK")


def test_two_process_somatic_byte_equal(tmp_path):
    """Distributed tumor/normal subtraction (VERDICT r3 #6): the normal
    BAM host-sharded, per-process local clip maps + discordant counting,
    per-row triples summed across processes — byte-equal temp AND final
    somatic.sv vs the sequential pass."""
    _run_workers(["somatic", "/root/reference/example/cancer.sv",
                  str(tmp_path)], "MULTIHOST_SOMATIC_OK",
                 bam="/root/reference/example/normal.sort.bam")
