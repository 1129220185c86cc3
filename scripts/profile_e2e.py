#!/usr/bin/env python3
"""Stage-attributed e2e profile (round-4 verdict weak #1).

Runs the full --second-best pipeline on synthetic assemblies with the
stagetimer enabled and prints where the wall goes: device/transfer waits
(dp.gather, fin.gather) vs host segments (prep, replay, postprocess,
raw_rows, pend, fin.dispatch, fin.assemble, fin.write) vs untimed residue.

Usage: python scripts/profile_e2e.py [--mbp 1.6 20] [--threads 1] [--reps 1]
"""

import argparse
import json
import os
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)
sys.path.insert(0, os.path.join(here, "scripts"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, nargs="+", default=[1.6, 20.0])
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--device-batch", type=int, default=152)
    args = ap.parse_args()

    import numpy as np

    from scale_smoke import synthesize
    from stringdecomposer_tpu.io.fasta import load_fasta
    from stringdecomposer_tpu.pipeline import run as pipeline_run
    from stringdecomposer_tpu.utils import stagetimer

    data = os.path.join(here, "stringdecomposer_tpu", "test_data")
    mono_fa = os.path.join(data, "DXZ1_star_monomers.fa")
    monomers_fwd = load_fasta(mono_fa)

    for i, mbp in enumerate(args.mbp):
        n = int(mbp * 1_000_000)
        asm = synthesize(n, monomers_fwd, np.random.default_rng(i))
        with tempfile.TemporaryDirectory() as td:
            asm_fa = os.path.join(td, "asm.fa")
            with open(asm_fa, "w") as f:
                f.write(">asm\n" + asm + "\n")
            # warm all shapes
            pipeline_run(asm_fa, mono_fa, out_dir=os.path.join(td, "w"),
                         second_best=True, device_batch=args.device_batch,
                         threads=args.threads)
            stagetimer.enable()
            t0 = time.perf_counter()
            final = pipeline_run(asm_fa, mono_fa, out_dir=os.path.join(td, "t"),
                                 second_best=True,
                                 device_batch=args.device_batch,
                                 threads=args.threads)
            wall = time.perf_counter() - t0
            stagetimer.disable()
            with open(final) as f:
                n_rows = sum(1 for _ in f)
        snap = stagetimer.snapshot()
        cnt = stagetimer.counts()
        timed = sum(snap.values())
        print(json.dumps({
            "mbp": mbp, "threads": args.threads, "wall_s": round(wall, 3),
            "rows": n_rows, "rows_per_s": round(n_rows / wall, 1),
            "stages_s": {k: round(v, 3) for k, v in sorted(snap.items())},
            "stage_calls": cnt,
            "timed_s": round(timed, 3),
            "untimed_residue_s": round(wall - timed, 3),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
