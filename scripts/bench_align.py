#!/usr/bin/env python3
"""Benchmark the general alignment API (C12 parity surface) on hardware.

Measures, on pairs synthesized at a given divergence:
  1. memory-bounded PATH (Hirschberg, exact-distance-first banded sweeps)
     at 256 kbp and 1 Mbp — the round-2 verdict's "megabase PATH" item;
  2. SHW / HW small-k scans (banded) vs k=-1 (full) on long targets.

Every timed result is verified: the banded Hirschberg CIGAR must reproduce
the pair's edit distance exactly (validity + optimality assert inside
align()), and HW/SHW banded distances must equal the full-scan ones.

Usage: python scripts/bench_align.py [--sizes 262144,1048576] [--div 0.01]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def synth_pair(n, divergence, rng):
    q = rng.integers(0, 4, n, dtype=np.int8)
    t = q.copy()
    n_mut = int(n * divergence)
    idx = np.sort(rng.choice(n, n_mut, replace=False))
    kinds = rng.integers(0, 3, n_mut)
    t_list = t.tolist()
    for i, kind in zip(idx[::-1].tolist(), kinds[::-1].tolist()):
        if kind == 0:
            t_list[i] = (t_list[i] + 1 + int(rng.integers(3))) % 4
        elif kind == 1:
            del t_list[i]
        else:
            t_list.insert(i, int(rng.integers(4)))
    alpha = np.array(list("ACGT"))
    return ("".join(alpha[q]), "".join(alpha[np.array(t_list)]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="262144,1048576")
    ap.add_argument("--div", type=float, default=0.01)
    args = ap.parse_args()

    import os

    if os.environ.get("JAX_PLATFORMS"):
        # the hosted TPU plugin ignores the env var; the config update is
        # binding (must run before any backend init)
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    sys.path.insert(0, "/root/repo")
    from stringdecomposer_tpu.ops.align import align

    from stringdecomposer_tpu.ops import banded_pallas as bp

    backends = [b for b in ("scan", "pallas") if b != "pallas" or
                not os.environ.get("SDTPU_SCAN_ONLY")]
    rng = np.random.default_rng(0)
    for n in (int(s) for s in args.sizes.split(",")):
        q, t = synth_pair(n, args.div, rng)
        base = {}
        for backend in backends:
            bp.DEFAULT_BACKEND = backend
            t0 = time.perf_counter()
            r = align(q, t, mode="NW", task="path")
            dt = time.perf_counter() - t0
            ed = r["editDistance"]
            if backend == "scan":
                base["path"] = (dt, ed)
            gc = (len(q) * len(t)) / dt / 1e9
            sp = base["path"][0] / dt
            assert ed == base["path"][1], (backend, ed, base["path"][1])
            print(f"PATH NW {n/1e3:8.0f} kbp x {len(t)/1e3:.0f} kbp "
                  f"div={args.div} [{backend:6s}] d={ed} wall={dt:8.2f}s "
                  f"({gc:7.2f} Gcells-equiv/s, {sp:5.1f}x scan)")

    # SHW/HW banded small-k scaling on a 4 kbp query vs a 1 Mbp target
    tq, tt = synth_pair(4096, args.div, rng)
    big_t = tt * 256  # ~1 Mbp target
    for mode in ("SHW", "HW"):
        for backend in backends:
            bp.DEFAULT_BACKEND = backend
            ref = None
            for k in (64, 256, -1):
                t0 = time.perf_counter()
                r = align(tq, big_t[: 1 << 20], mode=mode, task="distance", k=k)
                dt = time.perf_counter() - t0
                d = r["editDistance"]
                if k != -1 and d != -1:
                    ref = d
                if k == -1 and ref is not None:
                    assert d == ref, (mode, d, ref)
                print(f"{mode} 4 kbp x 1 Mbp [{backend:6s}] k={k:5d} "
                      f"d={d:6d}  wall={dt:7.2f}s")
    bp.DEFAULT_BACKEND = "scan"


if __name__ == "__main__":
    main()
