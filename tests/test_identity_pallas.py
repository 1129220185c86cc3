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


def test_dynamic_tile_steps_extreme_variance():
    """Per-tile dynamic trip counts (round 5): tiles whose own max diagonal
    is far below the batch max must still produce exact results — both with
    lengths sorted (short tiles stop early) and scrambled (every tile
    carries one long pair)."""
    rng = np.random.default_rng(11)
    alpha = list("ACGT")
    pairs = []
    for _ in range(30):  # short pairs
        pairs.append(("".join(rng.choice(alpha, int(rng.integers(5, 30)))),
                      "".join(rng.choice(alpha, int(rng.integers(5, 30))))))
    for _ in range(4):  # long outliers
        pairs.append(("".join(rng.choice(alpha, int(rng.integers(200, 250)))),
                      "".join(rng.choice(alpha, int(rng.integers(200, 250))))))
    for order in (np.argsort([len(a) + len(b) for a, b in pairs]),
                  rng.permutation(len(pairs))):
        qs = [pairs[i][0] for i in order]
        ts = [pairs[i][1] for i in order]
        q, ql = _pad_batch(qs)
        t, tl = _pad_batch(ts)
        d0, m0, l0 = (np.asarray(x) for x in nw_identity_batch(q, ql, t, tl))
        d1, m1, l1 = (np.asarray(x) for x in
                      nw_identity_batch_pallas(q, ql, t, tl, pair_tile=8))
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(m0, m1)
        np.testing.assert_array_equal(l0, l1)


def test_packed_both_matches_pairwise_scan():
    """nw_identity_packed_both (device-resident finishing path): block
    extraction from the read, on-device homo collapse, cross-product
    expansion, and the round-5 sort/unsort must reproduce the per-pair scan
    for BOTH variants — including scrambled block order with a long outlier
    and zero-length pad rows."""
    import jax.numpy as jnp

    from stringdecomposer_tpu.finishing import homo_compress
    from stringdecomposer_tpu.io.fasta import encode
    from stringdecomposer_tpu.ops.identity_pallas import nw_identity_packed_both

    rng = np.random.default_rng(23)
    alpha = list("ACGT")
    unit = "".join(rng.choice(alpha, 17))
    read = (unit * 40)[:600]
    # scrambled blocks: short, medium, one long outlier, repeated starts
    blocks = [(5, 20), (100, 17), (0, 230), (40, 8), (300, 60), (100, 17),
              (550, 50), (7, 1)]
    starts = np.array([s for s, _ in blocks], dtype=np.int64)
    lens = np.array([ln for _, ln in blocks], dtype=np.int32)
    monos = ["".join(rng.choice(alpha, int(n))) for n in (17, 23, 11)]
    mono_codes = [encode(m) for m in monos]
    homo_codes = [encode(homo_compress(m)) for m in monos]

    from stringdecomposer_tpu.finishing import _pad_codes

    t_raw, tl_raw = _pad_codes(mono_codes)
    t_homo, tl_homo = _pad_codes(homo_codes)
    n_pad = 16  # > len(blocks): exercises zero-length pad rows
    out = np.asarray(nw_identity_packed_both(
        jnp.asarray(encode(read)), starts, lens,
        jnp.asarray(t_raw), tl_raw, jnp.asarray(t_homo), tl_homo,
        n_pad=n_pad, Lq=256,
    )).astype(np.int64)  # [2, n_pad*M, 2]
    M = len(monos)
    for v, variant_codes in enumerate((mono_codes, homo_codes)):
        subs = []
        for s, ln in blocks:
            sub = encode(read)[s : s + ln]
            subs.append(sub if v == 0 else
                        sub[np.concatenate(([True], sub[1:] != sub[:-1]))]
                        if len(sub) else sub)
        qs = [sub for sub in subs for _ in range(M)]
        ts = [tc for _ in subs for tc in variant_codes]
        q, ql = _pad_batch(["".join("ACGTN NN"[c] for c in x) for x in qs])
        t, tl = _pad_batch(["".join("ACGTN NN"[c] for c in x) for x in ts])
        d0, m0, l0 = (np.asarray(x) for x in nw_identity_batch(q, ql, t, tl))
        got = out[v].reshape(-1, M, 2)[: len(blocks)].reshape(-1, 2)
        np.testing.assert_array_equal(got[:, 0], d0)  # D
        np.testing.assert_array_equal(got[:, 1], l0)  # columns
        np.testing.assert_array_equal(got[:, 1] - got[:, 0], m0)  # matches
