#!/usr/bin/env python3
"""Randomized stress of the fused chain-DP kernel on REAL hardware vs the
NumPy oracle (CPU interpret mode cannot catch Mosaic lowering bugs).

Usage: python scripts/stress_kernel.py [n_cases] [seed]
"""

import os
import sys
import time

import numpy as np


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    from stringdecomposer_tpu.io.fasta import Record, add_reverse_complement, encode, pad_monomers
    from stringdecomposer_tpu.ops.chain_dp import build_window_batch
    from stringdecomposer_tpu.ops.chain_dp_pallas import chain_dp_forward_pallas
    from stringdecomposer_tpu.ops.oracle import Scoring, decompose_window_oracle
    from stringdecomposer_tpu.ops.traceback import blocks_from_device

    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    rng = np.random.default_rng(seed)
    alpha = np.array(list("ACGT"))
    fails = 0
    t0 = time.perf_counter()
    for case in range(n_cases):
        M = int(rng.integers(1, 7))
        monos = [
            Record(f"m{j}", "".join(rng.choice(alpha, int(rng.integers(5, 40)))))
            for j in range(M)
        ]
        monomers = add_reverse_complement(monos)
        Lpad = (max(len(m.seq) for m in monomers) + 7) // 8 * 8
        mono, lens = pad_monomers(monomers, pad_to=Lpad)
        sc = [(-1, -1, -1, 1), (-2, -1, -3, 2), (-1, -2, -1, 3), (0, -1, -1, 1)][case % 4]
        W = int(rng.integers(16, 260))
        B = int(rng.integers(1, 9))
        wins = []
        for _ in range(B):
            wl = int(rng.integers(1, W + 1))
            if rng.random() < 0.5:  # tandem-ish content with mutations
                reps = wl // len(monos[0].seq) + 2
                arr = np.array(list((monos[0].seq * reps)[:wl]))
                idx = rng.integers(0, len(arr), max(1, wl // 10))
                arr[idx] = rng.choice(alpha, len(idx))
                wins.append(encode("".join(arr)))
            else:
                wins.append(encode("".join(rng.choice(alpha, wl))))
        wb, wl_arr = build_window_batch(wins, W)
        kw = dict(ins=sc[0], dele=sc[1], mismatch=sc[2], match=sc[3])
        bl, ct = chain_dp_forward_pallas(wb, wl_arr, mono, lens, **kw)
        bl, ct = np.asarray(bl), np.asarray(ct)
        for b in range(B):
            want = [
                (blk.monomer, blk.start, blk.end, blk.identity)
                for blk in decompose_window_oracle(wins[b], mono, lens, Scoring(*sc))
            ]
            got = [
                (g.monomer, g.start, g.end, g.identity)
                for g in blocks_from_device(bl[b], ct[b])
            ]
            if got != want:
                fails += 1
                print(f"case {case} window {b}: MISMATCH sc={sc}")
                print("  got ", got[:6])
                print("  want", want[:6])
        print(f"case {case}: done (M={M} W={W} B={B} sc={sc})", flush=True)
    print(f"STRESS DONE: {fails} failures in {time.perf_counter() - t0:.0f}s")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
