"""identity_pallas vs the jnp nw_identity_batch (which is itself pinned to
reference-edlib fixtures in test_identity.py): same (dist, matches, columns)
on every fixture pair, across pair-tile boundaries and length buckets."""

import numpy as np
import pytest

from stringdecomposer_tpu.ops.identity import nw_identity_batch
from stringdecomposer_tpu.ops.identity_pallas import nw_identity_batch_pallas


def _pad_batch(strs):
    codes = [np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int8) for s in strs]
    L = max(1, max(len(c) for c in codes))
    arr = np.full((len(codes), L), 7, dtype=np.int8)
    lens = np.zeros(len(codes), dtype=np.int32)
    for i, c in enumerate(codes):
        arr[i, : len(c)] = c
        lens[i] = len(c)
    return arr, lens


def test_pallas_matches_jnp_kernel(edlib_cases):
    cases = edlib_cases[::3]  # subsample for interpret-mode speed
    q, ql = _pad_batch([c["q"] for c in cases])
    t, tl = _pad_batch([c["t"] for c in cases])
    d0, m0, l0 = (np.asarray(x) for x in nw_identity_batch(q, ql, t, tl))
    d1, m1, l1 = (
        np.asarray(x)
        for x in nw_identity_batch_pallas(q, ql, t, tl, pair_tile=32, t_tile=16)
    )
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_array_equal(l0, l1)


def test_pallas_edge_lengths():
    # empty target, empty-ish query, tile-boundary lengths
    qs = ["A", "ACGT" * 8, "G" * 17, "ACGT"]
    ts = ["", "ACGT" * 8, "G" * 16, "T"]
    q, ql = _pad_batch(qs)
    t, tl = _pad_batch(ts)
    tl[0] = 0
    d0, m0, l0 = (np.asarray(x) for x in nw_identity_batch(q, ql, t, tl))
    d1, m1, l1 = (
        np.asarray(x)
        for x in nw_identity_batch_pallas(q, ql, t, tl, pair_tile=8, t_tile=8)
    )
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_array_equal(l0, l1)


def test_pallas_wavefront_wrap_edges():
    """Adversarial shapes for the systolic circular buffer: query lengths at
    the lane-count boundary (off = 1), targets as long as the lane array,
    and qlen << tlen skews — the cases where lane-0 wraparound could bite."""
    rng = np.random.default_rng(3)
    alpha = "ACGT"
    qs, ts = [], []
    for ql, tl in [(126, 126), (126, 128), (1, 126), (126, 1), (64, 128),
                   (125, 100), (126, 127), (100, 128), (2, 2), (31, 33)]:
        qs.append("".join(rng.choice(list(alpha), ql)))
        ts.append("".join(rng.choice(list(alpha), tl)))
    # plus tandem-ish pairs (realistic monomer content)
    for _ in range(6):
        unit = "".join(rng.choice(list(alpha), 17))
        qs.append((unit * 9)[: int(rng.integers(80, 126))])
        ts.append(unit * int(rng.integers(1, 7)))
    q, ql_arr = _pad_batch(qs)
    t, tl_arr = _pad_batch(ts)
    d0, m0, l0 = (np.asarray(x) for x in nw_identity_batch(q, ql_arr, t, tl_arr))
    d1, m1, l1 = (
        np.asarray(x)
        for x in nw_identity_batch_pallas(q, ql_arr, t, tl_arr, pair_tile=8)
    )
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_array_equal(l0, l1)
