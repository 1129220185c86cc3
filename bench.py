#!/usr/bin/env python3
"""Benchmark: chain-DP (raw decomposition) throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference C++ dp stage emits 557 monomer
assignments for the 94,871 bp test read in 3.58 s on one CPU thread
(~156 assignments/s). Correctness is asserted in-run: the raw TSV must be
byte-identical to the reference binary's output before any number is
reported.
"""

import json
import sys
import time

BASELINE_ASSIGN_PER_S = 557 / 3.58  # reference dp binary, 1 CPU thread


def main() -> int:
    import io as _io
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    data = os.path.join(here, "stringdecomposer_tpu", "test_data")

    from stringdecomposer_tpu.io.fasta import add_reverse_complement, load_fasta
    from stringdecomposer_tpu.pipeline import PipelineConfig, decompose_reads
    from stringdecomposer_tpu.report import format_raw_rows

    reads = load_fasta(os.path.join(data, "read.fa"))
    monomers = add_reverse_complement(load_fasta(os.path.join(data, "DXZ1_star_monomers.fa")))
    cfg = PipelineConfig(device_batch=152)

    # correctness gate: byte equality with the reference raw decomposition
    result = decompose_reads(reads, monomers, cfg)  # also warms the compile cache
    rows = []
    names = [m.name for m in monomers]
    for rname, blocks in result:
        rows.extend(format_raw_rows(rname, blocks, names))
    got = "".join(r + "\n" for r in rows)
    with open(os.path.join(data, "raw_decomposition_oracle.tsv")) as f:
        if got != f.read():
            print(json.dumps({"metric": "CORRECTNESS_FAILURE", "value": 0,
                              "unit": "", "vs_baseline": 0}))
            return 1
    n_assignments = len(rows)

    # throughput: repeat the read to saturate the device batch
    REP = 32
    reps = max(1, REP)
    big_reads = reads * reps
    decompose_reads(big_reads, monomers, cfg)  # warm any new shapes
    t0 = time.perf_counter()
    N_RUNS = 3
    for _ in range(N_RUNS):
        decompose_reads(big_reads, monomers, cfg)
    dt = (time.perf_counter() - t0) / N_RUNS
    assign_per_s = n_assignments * reps / dt

    print(json.dumps({
        "metric": "monomer assignments/s per chip (raw DP stage, test read, TSV byte-verified)",
        "value": round(assign_per_s, 1),
        "unit": "assignments/s",
        "vs_baseline": round(assign_per_s / BASELINE_ASSIGN_PER_S, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
