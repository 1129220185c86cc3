#!/usr/bin/env python3
"""Multi-device e2e scaling on the virtual CPU mesh (round-4 verdict
next-step #4).

Runs the full --second-best pipeline with --data-parallel (sharded DP +
sharded identity kernel) at 1/2/4/8 virtual devices and prints rows/s +
parallel efficiency per device count. Output bytes are asserted identical
across device counts (the determinism contract). Each device count needs
its own process (xla_force_host_platform_device_count is process-global),
so this script re-execs itself per point.

On CPU the per-device program is the lax.scan backend — absolute rates mean
nothing; the SHAPE of the curve (how well the window/pair batch axes
scale) is the measurement, and it transfers to a multi-chip ICI mesh
because the sharded program has zero cross-device collectives.

Usage: python scripts/scaling_curve.py [--mbp 0.35] [--devices 1,2,4,8]
"""

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(asm_fa: str, mono_fa: str, n_dev: int, device_batch: int) -> int:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, here)
    from stringdecomposer_tpu.parallel.sharding import (make_sharded_forward,
                                                        make_sharded_identity)
    from stringdecomposer_tpu.pipeline import run as pipeline_run

    assert len(jax.devices()) == n_dev
    fwd = make_sharded_forward()
    idk = make_sharded_identity()
    with tempfile.TemporaryDirectory() as td:
        pipeline_run(asm_fa, mono_fa, out_dir=os.path.join(td, "w"),
                     second_best=True, device_batch=device_batch,
                     forward_fn=fwd, identity_kernel=idk)  # warm
        t0 = time.perf_counter()
        final = pipeline_run(asm_fa, mono_fa, out_dir=os.path.join(td, "t"),
                             second_best=True, device_batch=device_batch,
                             forward_fn=fwd, identity_kernel=idk)
        dt = time.perf_counter() - t0
        h = hashlib.sha256()
        with open(final, "rb") as f:
            h.update(f.read())
        n_rows = sum(1 for _ in open(final))
    print(json.dumps({"devices": n_dev, "wall_s": round(dt, 3),
                      "rows": n_rows, "rows_per_s": round(n_rows / dt, 1),
                      "sha": h.hexdigest()[:16]}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=0.35)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--device-batch", type=int, default=64)
    ap.add_argument("--child", type=int, default=0)
    ap.add_argument("--asm", default=None)
    ap.add_argument("--mono", default=None)
    args = ap.parse_args()
    if args.child:
        return child(args.asm, args.mono, args.child, args.device_batch)

    sys.path.insert(0, here)
    sys.path.insert(0, os.path.join(here, "scripts"))
    import numpy as np

    from scale_smoke import synthesize
    from stringdecomposer_tpu.io.fasta import load_fasta

    data = os.path.join(here, "stringdecomposer_tpu", "test_data")
    mono_fa = os.path.join(data, "DXZ1_star_monomers.fa")
    asm = synthesize(int(args.mbp * 1e6), load_fasta(mono_fa),
                     np.random.default_rng(7))
    results = []
    with tempfile.TemporaryDirectory() as td:
        asm_fa = os.path.join(td, "asm.fa")
        with open(asm_fa, "w") as f:
            f.write(">asm\n" + asm + "\n")
        for n_dev in (int(x) for x in args.devices.split(",")):
            env = dict(os.environ, JAX_PLATFORMS="cpu")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child", str(n_dev), "--asm", asm_fa, "--mono", mono_fa,
                 "--device-batch", str(args.device_batch)],
                capture_output=True, text=True, timeout=3600, env=env,
            )
            if out.returncode != 0:
                print(out.stderr[-2000:], file=sys.stderr)
                return 1
            results.append(json.loads(out.stdout.strip().splitlines()[-1]))
    base = results[0]["rows_per_s"]
    shas = {r["sha"] for r in results}
    for r in results:
        r["speedup"] = round(r["rows_per_s"] / base, 2)
        r["efficiency"] = round(r["rows_per_s"] / base / r["devices"], 3)
        print(json.dumps(r))
    print(json.dumps({"bytes_identical_across_device_counts": len(shas) == 1}))
    return 0 if len(shas) == 1 else 1


if __name__ == "__main__":
    sys.exit(main())
