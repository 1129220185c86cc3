"""Native host runtime vs the Python/NumPy reference implementations."""

import numpy as np
import pytest

from stringdecomposer_tpu.finishing import homo_compress
from stringdecomposer_tpu.io.fasta import Record, add_reverse_complement, encode
from stringdecomposer_tpu.ops.oracle import Block, Scoring, align_read_oracle, postprocess
from stringdecomposer_tpu.io.fasta import pad_monomers
from stringdecomposer_tpu.report import format_raw_rows
from stringdecomposer_tpu.runtime.native import (
    format_raw_native,
    homo_compress_native,
    load_native,
    postprocess_native,
)

pytestmark = pytest.mark.skipif(load_native() is None, reason="no native toolchain")


def test_homo_compress_native():
    rng = np.random.default_rng(0)
    for _ in range(50):
        s = "".join(rng.choice(list("ACGT")) for _ in range(rng.integers(1, 80)))
        want = homo_compress(s)
        got = homo_compress_native(encode(s))
        assert "".join("ACGTN"[c] for c in got) == want


def test_postprocess_and_format_native(random_cases):
    for case in random_cases:
        monomers = add_reverse_complement([Record(n, s) for n, s in case["monomers"]])
        mono, lens = pad_monomers(monomers)
        sc = Scoring(*case["scoring"])
        reads = case.get("reads") or [["read0", case["read"]]]
        names = [m.name for m in monomers]
        rows_native = b""
        rows_py = []
        for rname, seq in reads:
            # pre-postprocess merged blocks, as produced by the window merge
            from stringdecomposer_tpu.ops.oracle import decompose_window_oracle, make_windows
            from stringdecomposer_tpu.io.fasta import encode as enc

            merged = []
            for off, ln in make_windows(len(seq), case["part_size"], case["overlap"]):
                for b in decompose_window_oracle(enc(seq[off : off + ln]), mono, lens, sc):
                    merged.append(Block(b.monomer, b.start + off, b.end + off, b.identity))
            arr = np.array(
                [[b.monomer, b.start, b.end, int(b.identity)] for b in merged],
                dtype=np.int32,
            ).reshape(-1, 4)
            keep = postprocess_native(arr)
            want_keep = postprocess(merged)
            got_blocks = [merged[i] for i in np.flatnonzero(keep)]
            assert got_blocks == want_keep
            rows_native += format_raw_native(arr[keep], rname, names)
            rows_py.extend(format_raw_rows(rname, want_keep, names))
        assert rows_native.decode() == "".join(r + "\n" for r in rows_py)
        assert rows_native.decode() == case["raw"]


def test_format_final_native_matches_python():
    """Native sd_format_final vs the Python emitter: randomized groups with
    duplicate names, "None" sentinels, identity thresholds, and an exact
    decimal-tie score sweep (m/L*100 doubles whose third decimal digit is an
    exact 5, e.g. 31/32*100 = 96.875 — both glibc %.2f and Python "{:.2f}"
    must round them half-even identically)."""
    import io

    from stringdecomposer_tpu.finishing import Rows, write_final_rows

    rng = np.random.default_rng(7)
    names = ["m1", "m2", "m1", "a_longer_name", "m3'"]
    uniq = ["m1", "m2", "a_longer_name", "m3'"]
    upos = {n: i for i, n in enumerate(uniq)}
    # score pool: random ratios + exact-tie doubles + sentinels
    ties = [31 / 32 * 100.0, 1 / 8 * 100.0, 7 / 64 * 100.0, 96.875, 0.125]
    pool = np.concatenate([
        (rng.integers(0, 200, 64) / rng.integers(1, 200, 64)) * 100.0,
        np.array(ties), np.array([0.0, -1.0, 100.0]),
    ])
    for th in (0, 60):
        n = 40
        best_idx = rng.integers(0, len(names), n).astype(np.int32)
        rows = Rows(
            names, uniq,
            best_idx,
            np.array([upos[names[i]] for i in best_idx], np.int32),
            rng.integers(0, 10**7, n).astype(np.int64),
            rng.integers(0, 10**7, n).astype(np.int64),
            rng.choice(pool, n),
            rng.integers(-1, len(uniq), n).astype(np.int32), rng.choice(pool, n),
            rng.integers(0, len(names), n).astype(np.int32), rng.choice(pool, n),
            rng.integers(-1, len(names), n).astype(np.int32), rng.choice(pool, n),
            rng.integers(0, 2, n).astype(bool),
            rng.choice(pool, (n, len(uniq))),
        )
        fn, an = io.StringIO(), io.StringIO()
        write_final_rows(fn, an, [("readX", rows)], identity_th=th)
        fp, ap = io.StringIO(), io.StringIO()
        write_final_rows(fp, ap, [("readX", list(rows))], identity_th=th)
        assert fn.getvalue() == fp.getvalue()
        assert an.getvalue() == ap.getvalue()
        assert fn.getvalue()  # non-empty: the sweep actually exercised rows
