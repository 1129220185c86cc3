#!/usr/bin/env python3
"""A/B the finishing kernel's PAIR_TILE (pairs per Pallas grid step) at the
production packed-path shapes on real hardware.

Hypothesis (docs/DESIGN.md): the finishing wavefront is per-step
fixed-cost-bound, not roll-byte-bound, so more sublanes per grid step
amortizes the fixed cost until VMEM caps out.

PAIR_TILE is read once at import, so run me once per value:

    SDTPU_PAIR_TILE=256  python scripts/ab_pair_tile.py
    SDTPU_PAIR_TILE=512  python scripts/ab_pair_tile.py
    SDTPU_PAIR_TILE=1024 python scripts/ab_pair_tile.py

The workload is the real finishing mix: the 557 golden blocks of the CHM13
test read tiled to one 4096-block chunk x 24 monomers x {raw, homo} — one
nw_identity_packed_both call, exactly what AsyncFinisher dispatches. A
sha256 of the packed result array is printed so runs can be cross-checked
for bit-identity.
"""

import hashlib
import json
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main() -> int:
    import numpy as np

    data = os.path.join(here, "stringdecomposer_tpu", "test_data")
    import jax.numpy as jnp

    from stringdecomposer_tpu.finishing import _pad_codes, homo_compress
    from stringdecomposer_tpu.io.fasta import (add_rc_interleaved, encode,
                                               load_fasta)
    from stringdecomposer_tpu.ops import identity_pallas as ip

    reads = load_fasta(os.path.join(data, "read.fa"))
    monomers = add_rc_interleaved(
        load_fasta(os.path.join(data, "DXZ1_star_monomers.fa")))
    mono_codes = [encode(m.seq) for m in monomers]
    homo_codes = [encode(homo_compress(m.seq)) for m in monomers]

    starts, ends = [], []
    with open(os.path.join(data, "raw_decomposition_oracle.tsv")) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            starts.append(int(parts[2]))
            ends.append(int(parts[3]))
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(ends, dtype=np.int32) - starts.astype(np.int32) + 1
    n_pad = 4096
    reps = -(-n_pad // len(starts))
    starts = np.tile(starts, reps)[:n_pad]
    lens = np.tile(lens, reps)[:n_pad]

    read_dev = jnp.asarray(encode(reads[0].seq))
    t_raw, tl_raw = _pad_codes(mono_codes)
    t_homo, tl_homo = _pad_codes(homo_codes)
    t_raw_d, t_homo_d = jnp.asarray(t_raw), jnp.asarray(t_homo)
    Lq = max(256, (int(lens.max()) + 127) // 128 * 128)

    def run():
        return ip.nw_identity_packed_both(
            read_dev, starts, lens, t_raw_d, tl_raw, t_homo_d, tl_homo,
            n_pad=n_pad, Lq=Lq)

    out = np.asarray(run())  # warm/compile
    digest = hashlib.sha256(out.tobytes()).hexdigest()[:16]
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        run().block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(json.dumps({
        "pair_tile": ip.PAIR_TILE,
        "median_s": round(dt, 4),
        "blocks_per_s": round(n_pad / dt, 1),
        "pairs_per_s": round(n_pad * 2 * len(monomers) / dt, 1),
        "digest": digest,
        "all_times": [round(t, 4) for t in times],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
