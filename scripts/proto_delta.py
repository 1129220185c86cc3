#!/usr/bin/env python3
"""Prototype: delta-encoded (bit-parallel-able) chain-DP forward pass.

Goal (DESIGN.md "next real jump"): replace the 30-bit packed (score,
pointer) ladder with a score-only pass whose per-column state is VERTICAL
DELTAS dp[i][k]-dp[i][k-1] from a tiny alphabet, so the deletion closure
becomes carry propagation instead of a log2(L)-roll ladder.

This file is a CPU laboratory, not product code:
  stage A  direct NumPy oracle of the single-monomer column DP with an
           enter boundary (the chain coupling enters only through a
           per-step scalar), transcribing the recurrence semantics of
           /root/reference/stringdecomposer/src/main.cpp:171-208
  stage B  empirical delta-alphabet scan (V = vertical, H = horizontal)
  stage C  delta-domain recurrence: same results using only elementwise
           ops on delta arrays + ONE sequential closure scan
  stage D  the closure scan as binary carry propagation (bit-packed)

Run: python scripts/proto_delta.py
"""

from __future__ import annotations

import numpy as np

NEG = -(1 << 28)


def column_dp_oracle(read, mono, chain, ins=-1, dele=-1, mism=-1, match=1):
    """Direct DP: dp[i][k] for one monomer; chain[i] is the externally
    supplied enter value used at read position i+1 (chain[i] = value of
    ending some block at position i). Returns the full dp cube."""
    W, L = len(read), len(mono)
    dp = np.full((W, L), NEG, np.int64)
    # init column i=0 (src/main.cpp:171-182): enter at position 0
    for k in range(L):
        mm = match if read[0] == mono[k] else mism
        dp[0][k] = k * dele + mm
        if k > 0:
            dp[0][k] = max(dp[0][k], dp[0][k - 1] + dele)
    for i in range(1, W):
        for k in range(L):
            mm = match if read[i] == mono[k] else mism
            cand = chain[i - 1] + k * dele + mm  # enter
            if k > 0:
                cand = max(cand, dp[i - 1][k - 1] + mm)  # diag
            cand = max(cand, dp[i - 1][k] + ins)  # ins
            if k > 0:
                cand = max(cand, dp[i][k - 1] + dele)  # del (closure)
            dp[i][k] = cand
    return dp


def delta_alphabet(trials=40, W=64, L=24, seed=0):
    rng = np.random.default_rng(seed)
    vs, hs = set(), set()
    for t in range(trials):
        read = rng.integers(0, 4, W)
        mono = rng.integers(0, 4, L)
        # plausible chain trajectory: starts near 0, drifts up like real
        # chained scores (bounded step-to-step movement)
        chain = np.cumsum(rng.integers(-1, 2, W)).astype(np.int64)
        dp = column_dp_oracle(read, mono, chain)
        v = np.diff(dp, axis=1)  # dp[i][k] - dp[i][k-1]
        h = np.diff(dp, axis=0)  # dp[i][k] - dp[i-1][k]
        vs |= set(np.unique(v).tolist())
        hs |= set(np.unique(h).tolist())
    return sorted(vs), sorted(hs)


def chain_dp_oracle(read, monos, ins=-1, dele=-1, mism=-1, match=1):
    """Self-consistent multi-monomer chain DP (the real coupling):
    chain[i] = max_m dp[i][m][len_m-1]. Returns (dp cube list, chain)."""
    W = len(read)
    dps = [np.full((W, len(m)), NEG, np.int64) for m in monos]
    chain = np.full(W, NEG, np.int64)
    for i in range(W):
        for mi, mono in enumerate(monos):
            L = len(mono)
            dp = dps[mi]
            for k in range(L):
                mm = match if read[i] == mono[k] else mism
                if i == 0:
                    cand = k * dele + mm
                else:
                    cand = chain[i - 1] + k * dele + mm
                    if k > 0:
                        cand = max(cand, dp[i - 1][k - 1] + mm)
                    cand = max(cand, dp[i - 1][k] + ins)
                if k > 0:
                    cand = max(cand, dp[i][k - 1] + dele)
                dp[i][k] = cand
        chain[i] = max(dps[mi][i][len(m) - 1] for mi, m in enumerate(monos))
    return dps, chain


def coupled_alphabet(trials=25, W=96, seed=1):
    rng = np.random.default_rng(seed)
    vs, hs, cs = set(), set(), set()
    for t in range(trials):
        M = int(rng.integers(2, 5))
        monos = [rng.integers(0, 4, int(rng.integers(8, 28))) for _ in range(M)]
        # half the reads are monomer-like (realistic), half uniform random
        if t % 2 == 0:
            read = np.concatenate(
                [monos[int(rng.integers(M))] for _ in range(1 + W // 16)]
            )[:W]
            read = np.where(rng.random(len(read)) < 0.1,
                            rng.integers(0, 4, len(read)), read)
        else:
            read = rng.integers(0, 4, W)
        dps, chain = chain_dp_oracle(read, monos)
        for dp in dps:
            vs |= set(np.unique(np.diff(dp, axis=1)).tolist())
            hs |= set(np.unique(np.diff(dp, axis=0)).tolist())
        cs |= set(np.unique(np.diff(chain)).tolist())
    return sorted(vs), sorted(hs), sorted(cs)


if __name__ == "__main__":
    v, h = delta_alphabet()
    print("V alphabet (ext chain):", v)
    print("H alphabet (ext chain):", h)
    v2, h2, c2 = coupled_alphabet()
    print("V alphabet (coupled):", v2)
    print("H alphabet (coupled):", h2)
    print("chain-step alphabet:", c2)
