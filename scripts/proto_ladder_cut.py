#!/usr/bin/env python3
"""Measure the adaptive-ladder flag rate on real data.

The chain-DP kernel's deletion closure is a log2(L)=8-level shift-and-max
ladder (5 of ~10 rolls/step). Proposal: run levels 1,2,4,8 (span 15), then a
VERIFY level at shift 16; if no lane shows a strict value take OR a
value-tie whose propagated start-pointer differs, the truncated state
already equals the full ladder's (value AND pointer) — proof sketch: the
no-flag condition gives a strict/equal descending chain F[k-16m] <= F[k]
with equal pointers on equalities, so every longer-range contribution is
either strictly dominated or a no-op; one fixed-point doubling step implies
all are. Otherwise the remaining levels run conditionally.

This script replays the EXACT per-column ladder of
ops/chain_dp_pallas._dp_kernel in NumPy over real windows (CHM13 test read
x DXZ1 monomers) and random junk, reporting what fraction of columns would
flag at each cut level — the expected hot-path roll count.

Run: python scripts/proto_ladder_cut.py [n_windows]
"""

from __future__ import annotations

import os
import sys

import numpy as np

NEG = -(1 << 30)


def simulate(window, monos, lens, L=256, cuts=(2, 4, 8, 16, 32, 64)):
    """Replay the packed kernel's per-column state (right-aligned layout) in
    NumPy; count, per column, the deepest level whose verify would flag."""
    R = len(monos)
    W = len(window)
    lane = np.arange(L)[None, :]
    off = (L - lens)[:, None]
    valid = lane >= off
    first = lane == off
    k_del = -(lane - off)
    lane_del = -lane
    mono = np.full((R, L), 5, np.int64)
    for r in range(R):
        mono[r, off[r, 0]:] = monos[r][: lens[r]]

    # init column (i=0)
    rc0 = window[0]
    mm0 = np.where(mono == rc0, 1, -1)
    base = np.where(first, mm0, (k_del + 1) + mm0)
    cand0 = np.where(valid, base, NEG)
    dp = np.maximum.accumulate(cand0 - lane_del, axis=1) + lane_del
    sp = np.zeros((R, L), np.int64)

    flag_hist = np.zeros(len(cuts) + 1, np.int64)  # [needed level > cuts[j]]
    chain_rows = R

    for i in range(1, W):
        rc = window[i]
        mm = np.where(mono == rc, 1, -1)
        chain = dp[:, L - 1].max()  # single window group here
        enter = chain + mm + k_del
        dp_sh = np.concatenate([np.full((R, 1), NEG), dp[:, :-1]], axis=1)
        sp_sh = np.concatenate([np.zeros((R, 1), np.int64), sp[:, :-1]], axis=1)
        diag = np.where(first, NEG, dp_sh + mm)
        insr = dp - 1
        cand = np.maximum(enter, np.maximum(diag, np.where(first, NEG, insr)))
        cand = np.where(valid, cand, NEG)
        candstart = np.where(cand == insr, sp,
                             np.where(cand == diag, sp_sh, i))
        # the ladder with per-level flag detection
        t = cand - lane_del
        p = candstart.copy()
        needed = 0  # deepest level index (1-based over s=1,2,...) that acted
        s, li = 1, 0
        while s < L:
            t_sh = np.concatenate([np.full((R, s), NEG), t[:, :-s]], axis=1)
            p_sh = np.concatenate([np.zeros((R, s), np.int64), p[:, :-s]], axis=1)
            take = t_sh >= t
            acts = valid & take & ((t_sh > t) | (p_sh != p))
            if acts.any():
                needed = li + 1
            t = np.maximum(t_sh, t)
            p = np.where(take, p_sh, p)
            s *= 2
            li += 1
        dp = t + lane_del
        sp = p
        # a column "flags at cut c" if any level with shift > c acted
        for j, c in enumerate(cuts):
            # levels with shift > c  <->  li index where 2^li > c
            if needed and (1 << (needed - 1)) > c:
                flag_hist[j] += 1
    return flag_hist, W - 1


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    from stringdecomposer_tpu.io.fasta import add_reverse_complement, load_fasta

    data = os.path.join(here, "stringdecomposer_tpu", "test_data")
    read = load_fasta(os.path.join(data, "read.fa"))[0].seq.upper()
    monos = add_reverse_complement(
        load_fasta(os.path.join(data, "DXZ1_star_monomers.fa"))
    )
    code = {c: i for i, c in enumerate("ACGTN")}
    mcodes = [np.array([code[c] for c in m.seq.upper()]) for m in monos]
    lens = np.array([len(m) for m in mcodes])

    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cuts = (2, 4, 8, 16, 32, 64)
    tot = np.zeros(len(cuts) + 1, np.int64)
    cols = 0
    rng = np.random.default_rng(0)
    for w in range(n_windows):
        start = w * 5000
        win = np.array([code[c] for c in read[start : start + 5500]])
        if len(win) < 100:
            break
        h, n = simulate(win, mcodes, lens, cuts=cuts)
        tot += h
        cols += n
        print(f"window {w}: flag rates {[f'{x/n:.4f}' for x in h[:-1]]}")
    print("REAL data: cuts", cuts)
    print("flag rates:", [f"{x/cols:.4f}" for x in tot[:-1]])

    # junk (uniform random read) — worst case for enter-plateau ties
    win = rng.integers(0, 4, 5500)
    h, n = simulate(win, mcodes, lens, cuts=cuts)
    print("JUNK data flag rates:", [f"{x/n:.4f}" for x in h[:-1]])


if __name__ == "__main__":
    main()
