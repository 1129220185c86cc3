#!/usr/bin/env python3
"""A/B the chain-DP group-max formulation (concat vs subroll) at production
shapes on real hardware.

The mode is fixed per process via $SDTPU_GROUP_MODE (read once at import of
chain_dp_pallas), so run me twice:

    SDTPU_GROUP_MODE=concat  python scripts/ab_group_mode.py
    SDTPU_GROUP_MODE=subroll python scripts/ab_group_mode.py

Measurement mirrors bench.py's throughput section (REP x test read,
median of 5) and gates on raw-TSV byte parity first.
"""

import json
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main() -> int:
    data = os.path.join(here, "stringdecomposer_tpu", "test_data")
    from stringdecomposer_tpu.io.fasta import add_reverse_complement, load_fasta
    from stringdecomposer_tpu.pipeline import PipelineConfig, decompose_reads
    from stringdecomposer_tpu.report import format_raw_rows

    mode = os.environ.get("SDTPU_GROUP_MODE", "concat")
    reads = load_fasta(os.path.join(data, "read.fa"))
    monomers = add_reverse_complement(load_fasta(os.path.join(data, "DXZ1_star_monomers.fa")))
    cfg = PipelineConfig(device_batch=152)

    result = decompose_reads(reads, monomers, cfg)
    rows = []
    names = [m.name for m in monomers]
    for rname, blocks in result:
        rows.extend(format_raw_rows(rname, blocks, names))
    got = "".join(r + "\n" for r in rows)
    with open(os.path.join(data, "raw_decomposition_oracle.tsv")) as f:
        ok = got == f.read()
    if not ok:
        print(json.dumps({"mode": mode, "parity": False}))
        return 1

    REP = 32
    big_reads = reads * REP
    decompose_reads(big_reads, monomers, cfg)  # warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        decompose_reads(big_reads, monomers, cfg)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(json.dumps({
        "mode": mode, "parity": True,
        "median_s": round(dt, 4),
        "assignments_per_s": round(len(rows) * REP / dt, 1),
        "all_times": [round(t, 4) for t in times],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
