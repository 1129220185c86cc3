#!/usr/bin/env python3
"""Scale smoke: synthesize a centromere-like assembly (tandem mutated
DXZ1 monomers), run the raw DP stage, and report throughput.

Usage: python scripts/scale_smoke.py [Mbp] [device_batch]
"""

import os
import sys
import time

import numpy as np


def synthesize(n_bp: int, monomers, rng) -> str:
    units = [m.seq for m in monomers]
    out = []
    total = 0
    while total < n_bp:
        u = list(units[rng.integers(len(units))])
        # ~5% divergence: substitutions, small indels
        for _ in range(max(1, len(u) // 20)):
            p = int(rng.integers(len(u)))
            r = rng.random()
            if r < 0.6:
                u[p] = "ACGT"[rng.integers(4)]
            elif r < 0.8 and len(u) > 2:
                del u[p]
            else:
                u.insert(p, "ACGT"[rng.integers(4)])
        s = "".join(u)
        out.append(s)
        total += len(s)
    return "".join(out)[:n_bp]


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    from stringdecomposer_tpu.io.fasta import Record, add_reverse_complement, load_fasta
    from stringdecomposer_tpu.pipeline import PipelineConfig, decompose_reads

    mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    device_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 152
    data = os.path.join(here, "stringdecomposer_tpu", "test_data")
    monomers_fwd = load_fasta(os.path.join(data, "DXZ1_star_monomers.fa"))
    monomers = add_reverse_complement(monomers_fwd)
    rng = np.random.default_rng(0)
    n_bp = int(mbp * 1e6)
    asm = synthesize(n_bp, monomers_fwd, rng)
    reads = [Record("asm", asm)]
    cfg = PipelineConfig(device_batch=device_batch)

    t0 = time.perf_counter()
    res = decompose_reads(reads, monomers, cfg)
    warm_note = "(cold incl. compile)"
    dt = time.perf_counter() - t0
    n = sum(len(b) for _, b in res)
    print(f"{mbp} Mbp assembly: {n} assignments in {dt:.1f}s {warm_note}")

    t0 = time.perf_counter()
    res = decompose_reads(reads, monomers, cfg)
    dt = time.perf_counter() - t0
    print(
        f"warm: {n} assignments in {dt:.1f}s = {n/dt:.0f} assignments/s, "
        f"{n_bp/dt/1e6:.2f} Mbp/s on {os.environ.get('JAX_PLATFORMS', 'default')}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
