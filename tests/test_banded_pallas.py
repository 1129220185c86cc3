"""Parity of the fused Pallas banded sweep (ops/banded_pallas.py) against
the lax.scan banded primitives in ops/align.py (themselves fixture-verified
against the reference edlib). CPU runs the kernel interpreted; the same
program compiles with Mosaic on hardware (make test_tpu)."""

import numpy as np
import pytest

from stringdecomposer_tpu.ops import banded_pallas as bp
from stringdecomposer_tpu.ops.align import (
    dp_banded_lastrow_batch,
    dp_banded_nw_batch,
)


def _bucketed(rng, P, Lq_max, Lt_max):
    """Random case on pow2-bucketed array shapes (random lens decide the
    real sizes): full coverage with O(1) distinct jit compiles per suite."""
    Lq = 1 << int(np.ceil(np.log2(Lq_max)))
    Lt = 1 << int(np.ceil(np.log2(Lt_max)))
    q = rng.integers(0, 4, (P, Lq)).astype(np.int8)
    t = rng.integers(0, 4, (P, Lt)).astype(np.int8)
    ql = rng.integers(0, Lq + 1, P).astype(np.int32)
    tl = rng.integers(0, Lt + 1, P).astype(np.int32)
    return q, ql, t, tl


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_final_column_parity_random(seed):
    rng = np.random.default_rng(seed)
    for _ in range(8):
        q, ql, t, tl = _bucketed(rng, 4, 200, 300)
        k = int(rng.choice([1, 3, 8, 16, 64]))
        want = np.asarray(dp_banded_lastrow_batch(q, ql, t, tl, k=k))
        got = np.asarray(bp.banded_final_column_pallas(q, ql, t, tl, k=k))
        assert (want == got).all(), (ql, tl, k)


def test_final_column_parity_mask_mode():
    rng = np.random.default_rng(3)
    for _ in range(6):
        P, Lq, Lt = 4, 256, 256
        k = int(rng.choice([2, 8, 33]))
        A = 7  # small compact alphabet with ambiguity: 2 bits set per row
        qm = ((1 << rng.integers(0, A, (P, Lq)))
              | (1 << rng.integers(0, A, (P, Lq)))).astype(np.int32)
        ti = rng.integers(0, A, (P, Lt)).astype(np.int32)
        ql = rng.integers(0, Lq + 1, P).astype(np.int32)
        tl = rng.integers(0, Lt + 1, P).astype(np.int32)
        want = np.asarray(dp_banded_lastrow_batch(qm, ql, ti, tl, k=k,
                                                  use_mask=True))
        got = np.asarray(bp.banded_final_column_pallas(qm, ql, ti, tl, k=k,
                                                       use_mask=True))
        assert (want == got).all()


def test_nw_dist_wrapper_matches_scan(monkeypatch):
    """_banded_nw_dist lane extraction == dp_banded_nw_batch when forced to
    the Pallas route (callers pre-filter |ql - tl| > k, mirrored here)."""
    from stringdecomposer_tpu.ops import align

    rng = np.random.default_rng(4)
    P, Lq, Lt, k = 5, 120, 130, 16
    q = rng.integers(0, 4, (P, Lq)).astype(np.int8)
    t = rng.integers(0, 4, (P, Lt)).astype(np.int8)
    ql = rng.integers(20, Lq + 1, P).astype(np.int32)
    tl = np.clip(ql + rng.integers(-k, k + 1, P), 0, Lt).astype(np.int32)
    want = np.asarray(dp_banded_nw_batch(q, ql, t, tl, k=k))
    monkeypatch.setattr(bp, "DEFAULT_BACKEND", "pallas")
    got = align._banded_nw_dist(q, ql, t, tl, k=k)
    assert (want == got).all()


def test_align_path_byte_identical_on_pallas_route(monkeypatch):
    """align(task=path) through the forced Pallas banded route returns the
    exact same CIGAR as the scan route (the sweeps are value-identical, so
    every Hirschberg split lands identically)."""
    from stringdecomposer_tpu.ops import align

    rng = np.random.default_rng(5)
    n = 3000
    qs = rng.integers(0, 4, n)
    ts = qs.copy()
    for i in sorted(rng.choice(n, 60, replace=False).tolist(), reverse=True):
        ts[i] = (ts[i] + 1 + rng.integers(3)) % 4
    alpha = np.array(list("ACGT"))
    q = "".join(alpha[qs])
    t = "".join(alpha[ts])
    # force Hirschberg + banding: tiny cell limit so the recursion engages
    monkeypatch.setattr(align, "MOVES_CELL_LIMIT", 1 << 12)
    r_scan = align.align(q, t, mode="NW", task="path")
    monkeypatch.setattr(bp, "DEFAULT_BACKEND", "pallas")
    r_pal = align.align(q, t, mode="NW", task="path")
    assert r_scan["editDistance"] == r_pal["editDistance"]
    assert r_scan["cigar"] == r_pal["cigar"]


@pytest.mark.parametrize("seed", [10, 11])
def test_myers_contract_vs_scan(seed):
    """Bit-parallel route: exact wherever the scan value is <= k (all any
    caller observes), >= the scan elsewhere (virtual-boundary garbage may
    differ from BIG-boundary garbage, both > k)."""
    from stringdecomposer_tpu.ops.align import BIG

    rng = np.random.default_rng(seed)
    for _ in range(8):
        q, ql, t, tl = _bucketed(rng, 4, 220, 300)
        k = int(rng.choice([1, 2, 8, 31, 64, 100]))
        want = np.asarray(dp_banded_lastrow_batch(q, ql, t, tl, k=k))
        got = np.asarray(bp.banded_final_column_myers(q, ql, t, tl, k=k))
        assert np.all((want == got) | (want > k)), (ql, tl, k)
        assert np.all((got >= want) | (want >= BIG)), (ql, tl, k)


def test_align_path_byte_identical_on_myers_route(monkeypatch):
    """A divergent pair routed through the bit-parallel sweeps yields the
    exact same CIGAR as the scan route: every Hirschberg split decision
    reads only values <= the segment distance, where the routes agree."""
    from stringdecomposer_tpu.ops import align

    rng = np.random.default_rng(12)
    n = 4000
    qs = rng.integers(0, 4, n)
    ts = qs.copy()
    for i in sorted(rng.choice(n, 120, replace=False).tolist(), reverse=True):
        ts[i] = (ts[i] + 1 + rng.integers(3)) % 4
    alpha = np.array(list("ACGT"))
    q = "".join(alpha[qs])
    t = "".join(alpha[ts])
    monkeypatch.setattr(align, "MOVES_CELL_LIMIT", 1 << 12)
    r_scan = align.align(q, t, mode="NW", task="path")
    monkeypatch.setattr(bp, "DEFAULT_BACKEND", "pallas")
    monkeypatch.setattr(bp, "MYERS_MIN_K", 8)  # force the route on small kb
    r_my = align.align(q, t, mode="NW", task="path")
    assert r_scan["editDistance"] == r_my["editDistance"]
    assert r_scan["cigar"] == r_my["cigar"]


def test_myers_trusted_distance_exact(monkeypatch):
    """_banded_nw_dist on the Myers route: any result <= k equals the true
    NW distance (the k-doubling loop's trust rule)."""
    from stringdecomposer_tpu.ops import align

    rng = np.random.default_rng(13)
    monkeypatch.setattr(bp, "DEFAULT_BACKEND", "pallas")
    monkeypatch.setattr(bp, "MYERS_MIN_K", 8)
    for _ in range(6):
        n = int(rng.integers(50, 400))
        qs = rng.integers(0, 4, n)
        ts = qs.copy()
        nmut = int(rng.integers(0, n // 8))
        for i in sorted(rng.choice(n, nmut, replace=False).tolist(),
                        reverse=True):
            ts[i] = (ts[i] + 1 + rng.integers(3)) % 4
        alpha = np.array(list("ACGT"))
        r = align.align("".join(alpha[qs]), "".join(alpha[ts]), mode="NW",
                        task="distance")
        monkeypatch.setattr(bp, "DEFAULT_BACKEND", "scan")
        r_ref = align.align("".join(alpha[qs]), "".join(alpha[ts]),
                            mode="NW", task="distance")
        monkeypatch.setattr(bp, "DEFAULT_BACKEND", "pallas")
        assert r["editDistance"] == r_ref["editDistance"]


def test_supported_gates():
    assert not bp.supported(4, 100, 0, 8, None)  # Lt == 0
    assert not bp.supported(4, 100, 100, 8, np.zeros(4))  # lut mode
    assert bp.supported(4, 1000, 1000, 64, None)
    assert not bp.supported(4096, 100000, 100000, 60000, None)  # VMEM


def test_shw_transpose_route_matches_scan(monkeypatch):
    """SHW small-k results via the transposed banded-NW final column equal
    the scan route: distance, found flag, and the full end-location sets."""
    from stringdecomposer_tpu.ops import align

    rng = np.random.default_rng(14)
    alpha = np.array(list("ACGT"))
    qs, ts = [], []
    for _ in range(5):
        n = int(rng.integers(300, 900))
        a = rng.integers(0, 4, n)
        tlen = int(rng.integers(n // 2, 2 * n))
        b = np.concatenate([a, rng.integers(0, 4, max(0, tlen - n))])[:tlen]
        nm = int(rng.integers(0, 30))
        for i in sorted(rng.choice(len(b), min(nm, len(b)),
                                   replace=False).tolist(), reverse=True):
            b[i] = (b[i] + 1 + rng.integers(3)) % 4
        qs.append("".join(alpha[a]))
        ts.append("".join(alpha[b]))
    want = align.align_batch(qs, ts, mode="SHW", task="locations", k=64)
    monkeypatch.setattr(bp, "DEFAULT_BACKEND", "pallas")
    monkeypatch.setattr(bp, "MYERS_MIN_K", 8)
    got = align.align_batch(qs, ts, mode="SHW", task="locations", k=64)
    for w, g in zip(want, got):
        assert w["editDistance"] == g["editDistance"]
        assert w["endLocations"] == g["endLocations"]


def test_semi_global_route_matches_scan(monkeypatch):
    """HW (infix) and SHW results via the fused full-height semi-global
    Myers kernel equal the scan routes — small-k banded branches and the
    k=-1 full sweeps, including empty-query rows."""
    from stringdecomposer_tpu.ops import align

    rng = np.random.default_rng(15)
    alpha = np.array(list("ACGT"))
    qs, ts = [], []
    for _ in range(4):
        n = int(rng.integers(100, 600))
        a = rng.integers(0, 4, n)
        big = np.concatenate([rng.integers(0, 4, 300), a,
                              rng.integers(0, 4, 500)])
        nm = int(rng.integers(0, 20))
        for i in sorted(rng.choice(len(big), nm, replace=False).tolist(),
                        reverse=True):
            big[i] = (big[i] + 1 + rng.integers(3)) % 4
        qs.append("".join(alpha[a]))
        ts.append("".join(alpha[big]))
    qs.append("")
    ts.append("ACGTACGT")
    for mode in ("HW", "SHW"):
        for k in (48, -1):
            monkeypatch.setattr(bp, "DEFAULT_BACKEND", "scan")
            want = align.align_batch(qs, ts, mode=mode, task="locations", k=k)
            monkeypatch.setattr(bp, "DEFAULT_BACKEND", "pallas")
            got = align.align_batch(qs, ts, mode=mode, task="locations", k=k)
            for w, g in zip(want, got):
                assert w["editDistance"] == g["editDistance"], (mode, k)
                assert w["endLocations"] == g["endLocations"], (mode, k)
                assert w["startLocations"] == g["startLocations"], (mode, k)


def test_align_data_parallel_byte_identical(monkeypatch):
    """SDTPU_ALIGN_DP: results over the 8-device virtual mesh (the default
    in this suite) are byte-identical to forced single-device execution —
    rows are independent pairs, sharding must be invisible."""
    import jax

    from stringdecomposer_tpu.ops import align

    assert len(jax.devices()) >= 2  # conftest forces the virtual mesh
    rng = np.random.default_rng(16)
    alpha = np.array(list("ACGT"))
    qs, ts = [], []
    for _ in range(19):  # odd, > n_dev: exercises row padding
        n = int(rng.integers(50, 500))
        a = rng.integers(0, 4, n)
        b = a.copy()
        for i in sorted(rng.choice(n, int(rng.integers(0, 12)),
                                   replace=False).tolist(), reverse=True):
            b[i] = (b[i] + 1 + rng.integers(3)) % 4
        qs.append("".join(alpha[a]))
        ts.append("".join(alpha[b]))
    for mode, task in (("NW", "path"), ("SHW", "locations"),
                       ("HW", "locations")):
        sharded = align.align_batch(qs, ts, mode=mode, task=task, k=40)
        monkeypatch.setattr(align, "ALIGN_DATA_PARALLEL", "off")
        single = align.align_batch(qs, ts, mode=mode, task=task, k=40)
        monkeypatch.setattr(align, "ALIGN_DATA_PARALLEL", "auto")
        assert sharded == single, (mode, task)
