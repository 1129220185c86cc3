#!/bin/bash
# Turnkey hardware measurement session: run when the TPU tunnel is healthy.
# Collects, in order of importance, everything round 3 needs from the chip;
# each step has its own timeout so one hang cannot eat the session.
# Usage: bash scripts/hw_roundup.sh [outdir]   (default /tmp/hw_roundup)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hw_roundup}
mkdir -p "$OUT"
note() { echo "== $* ($(date +%H:%M:%S)) =="; }

note probe
if ! timeout 180 python -c "import jax; print(jax.devices())" > "$OUT/probe.txt" 2>&1; then
  echo "TPU UNAVAILABLE — aborting (see $OUT/probe.txt)"; exit 3
fi
cat "$OUT/probe.txt"

note "golden CLI (byte gate)"
rm -rf "$OUT/golden"
timeout 900 python -m stringdecomposer_tpu stringdecomposer_tpu/test_data/read.fa \
  stringdecomposer_tpu/test_data/DXZ1_star_monomers.fa -o "$OUT/golden" --second-best \
  > "$OUT/golden.log" 2>&1
diff -q "$OUT/golden/final_decomposition.tsv" \
  stringdecomposer_tpu/test_data/final_decomposition_fc89af8.tsv \
  && echo GOLDEN_OK || echo GOLDEN_FAIL

note "K3 alignment kernels Mosaic parity"
SDTPU_TESTS_ON_TPU=1 timeout 1800 python -m pytest \
  tests/test_tpu_hardware.py::test_banded_and_semi_kernels_on_hardware \
  -q > "$OUT/k3.txt" 2>&1 && echo K3_OK || tail -5 "$OUT/k3.txt"

note "group-max A/B (ablate_chain)"
timeout 1200 python scripts/ablate_chain.py base subroll unroll8 hoist \
  > "$OUT/ablate.txt" 2>&1
tail -8 "$OUT/ablate.txt"

note "kernel-only rates + two-stage roofline"
timeout 900 python scripts/roofline_e2e.py > "$OUT/roofline.json" 2>&1
tail -1 "$OUT/roofline.json"

note "stage-attributed e2e profile (1.6 + 20 Mbp, -t 1)"
timeout 1800 python scripts/profile_e2e.py --mbp 1.6 20 --threads 1 \
  > "$OUT/profile.json" 2> "$OUT/profile.log"
cat "$OUT/profile.json"

note "bench.py (full: DP + e2e 1.6 Mbp + 20 Mbp + roofline + splits)"
timeout 3600 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.log"
cat "$OUT/bench.json"

note "host-threads A/B (-t 1 vs -t 4, 20 Mbp, byte gate)"
timeout 3600 python scripts/ab_threads.py 20 1,4 > "$OUT/threads.txt" 2>&1
tail -5 "$OUT/threads.txt"

note "alignment API (bench_align)"
timeout 2400 python scripts/bench_align.py > "$OUT/align.txt" 2>&1
cat "$OUT/align.txt"

note "kernel parity stress (quick)"
timeout 1200 python scripts/stress_kernel.py 5 > "$OUT/stress.txt" 2>&1
tail -2 "$OUT/stress.txt"
note done
