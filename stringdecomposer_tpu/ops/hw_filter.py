"""Batched infix (HW-mode) edit distance — the ed_thr monomer pre-filter.

The reference optionally shrinks the DP's monomer set per chunk: edlib HW
distance of every monomer against the chunk, keep the best plus all within
ed_thr, ordered by (distance, input index) (reference: src/main.cpp:128-149).
Distance in HW mode is the minimum over all end positions of a semi-global
NW with a free start in the target:

    D[0][j] = 0,  D[i][0] = i,
    D[i][j] = min(D[i-1][j-1] + sub, D[i-1][j] + 1, D[i][j-1] + 1)
    dist = min_j D[m][j]

Edit distance is unique (no co-optimal-path ambiguity), so a plain batched
scan over chunk positions reproduces edlib's HW numbers exactly. The scan
carries one column over monomer positions per (window, monomer) pair; the
within-column "up" chain folds into a prefix min (same trick as
ops/chain_dp.py).

On TPU the filter does not make the chain DP cheaper (shapes are static;
dropped monomers become masked rows) — it exists for output parity: the
monomer subset and its ORDER change tie-breaking in the DP and traceback.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.int32(1 << 28)


@jax.jit
def hw_distance_batch(
    windows: jnp.ndarray,  # [B, W] int8 codes (pad with a never-matching code)
    window_lens: jnp.ndarray,  # [B] int32
    mono: jnp.ndarray,  # [M, L] int8 codes (PAD_CODE-padded)
    mono_lens: jnp.ndarray,  # [M] int32
) -> jnp.ndarray:
    """Returns dist[B, M] int32: HW edit distance of each monomer vs each
    window (min over end positions, free target prefix)."""
    B, W = windows.shape
    M, L = mono.shape
    mono_i = mono.astype(jnp.int32)
    win_i = windows.astype(jnp.int32)
    i_idx = jnp.arange(L + 1, dtype=jnp.int32)  # [L+1] monomer axis rows
    # column rows: row 0 = boundary, rows 1..L = monomer positions
    mono_col = jnp.concatenate(
        [jnp.full((M, 1), -1, jnp.int32), mono_i], axis=1
    )  # [M, L+1]
    end_mask = i_idx[None, :] == mono_lens[:, None]  # [M, L+1] one-hot at m

    D0 = jnp.broadcast_to(i_idx[None, None, :], (B, M, L + 1))  # D[i][0] = i
    best0 = jnp.sum(jnp.where(end_mask[None], D0, 0), axis=2)  # dist at j=0: m

    def step(carry, x):
        D, best = carry
        wchar, j = x  # [B], scalar
        sub = jnp.where(mono_col[None] == wchar[:, None, None], 0, 1)  # [B, M, L+1]
        left = D + 1
        diag = jnp.concatenate([jnp.full_like(D[:, :, :1], BIG), D[:, :, :-1]], axis=2) + sub
        cand = jnp.minimum(left, diag)
        cand = cand.at[:, :, 0].set(0)  # free target prefix: D[0][j] = 0
        Dn = jax.lax.cummin(cand - i_idx[None, None, :], axis=2) + i_idx[None, None, :]
        endD = jnp.sum(jnp.where(end_mask[None], Dn, 0), axis=2)  # [B, M]
        active = j <= window_lens  # [B]
        best = jnp.where(active[:, None], jnp.minimum(best, endD), best)
        D = jnp.where(active[:, None, None], Dn, D)
        return (D, best), None

    xs = (win_i[:, :].T, jnp.arange(1, W + 1, dtype=jnp.int32))
    (_, best), _ = jax.lax.scan(step, (D0, best0), xs)
    return best


def _hw_kernel(
    tc_ref,  # [R, t_tile] int32 window chars
    q_ref,  # [R, L] int32 monomer codes, right-aligned
    qlen_ref,  # [R, 1] int32 monomer lengths
    tlen_ref,  # [R, 1] int32 window lengths
    out_ref,  # [R, 8] int32; lane 0 = HW distance
    D_s,  # scratch [R, L]
    m_s,  # scratch [R, 8] running min
    *,
    L: int,
    t_tile: int,
    n_tiles: int,
):
    from jax.experimental.pallas import tpu as pltpu

    R = q_ref.shape[0]
    t_idx = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    off = L - 1 - qlen_ref[...]
    valid = lane >= off
    first = lane == off
    tlen = tlen_ref[...]

    @pl.when(t_idx == 0)
    def _():
        D0 = jnp.where(valid, lane - off, BIG)  # D[i][0] = i
        D_s[...] = D0
        m_s[...] = jnp.broadcast_to(qlen_ref[...], (R, 8))  # dist at j=0: m

    q = q_ref[...]

    def ladder(t):
        s = 1
        while s < L:
            t = jnp.minimum(t, jnp.where(lane >= s, pltpu.roll(t, s, 1), BIG))
            s *= 2
        return t

    def body(s, carry):
        D, rmin, tc_r = carry
        j = t_idx * t_tile + s + 1
        sub = jnp.where(q == tc_r[:, :1], 0, 1)
        diag = jnp.where(first, BIG, pltpu.roll(D, 1, 1) + sub)
        cand = jnp.minimum(D + 1, diag)
        cand = jnp.where(first, 0, cand)  # free target prefix: D[0][j] = 0
        cand = jnp.where(valid, cand, BIG)
        D = ladder(cand - lane) + lane
        endD = D[:, L - 1 :]
        hit = (j <= tlen) & (endD < rmin[:, :1])
        rmin = jnp.where(hit, jnp.broadcast_to(endD, rmin.shape), rmin)
        return D, rmin, pltpu.roll(tc_r, t_tile - 1, 1)

    D, rmin, _ = jax.lax.fori_loop(
        0, t_tile, body, (D_s[...], m_s[...], tc_ref[...])
    )
    D_s[...] = D
    m_s[...] = rmin

    @pl.when(t_idx == n_tiles - 1)
    def _():
        out_ref[...] = rmin


@partial(jax.jit, static_argnames=("pair_tile", "t_tile"))
def hw_distance_batch_pallas(
    windows: jnp.ndarray,  # [B, W] int8
    window_lens: jnp.ndarray,  # [B] int32
    mono: jnp.ndarray,  # [M, L] int8
    mono_lens: jnp.ndarray,  # [M] int32
    pair_tile: int = 512,
    t_tile: int = 128,
) -> jnp.ndarray:
    """Fused Pallas version of hw_distance_batch (same [B, M] output):
    (window, monomer) pairs on sublanes, monomer column on lanes, window
    chars streamed through a fori_loop — the ladder carries distance only,
    so the prefilter costs about half a chain-DP pass instead of a full
    second scan through HBM."""
    B, W = windows.shape
    M, Lq = mono.shape
    P = B * M
    # VMEM budget (see identity_pallas): shrink the pair tile, never OOM
    L_fit = (Lq + 1 + 127) // 128 * 128
    fit = max(8, ((8 << 20) // (L_fit * 12)) // 8 * 8)
    R = min(pair_tile, fit, max(8, -(-P // 8) * 8))
    P_pad = -(-P // R) * R
    L = (Lq + 1 + 127) // 128 * 128
    n_tiles = max(1, -(-W // t_tile))
    T_in = n_tiles * t_tile

    rc = jnp.repeat(windows.astype(jnp.int32), M, axis=0)  # row r = (b, m)
    rc = jnp.pad(rc, ((0, P_pad - P), (0, T_in - W)), constant_values=-9)
    q = jnp.broadcast_to(mono.astype(jnp.int32)[None], (B, M, Lq)).reshape(P, Lq)
    q = jnp.pad(q, ((0, P_pad - P), (0, L - Lq)), constant_values=-7)
    ql = jnp.broadcast_to(mono_lens.astype(jnp.int32)[None], (B, M)).reshape(P)
    ql = jnp.pad(ql, (0, P_pad - P))
    q = jax.vmap(lambda r, n: jnp.roll(r, L - n))(q, ql)  # right-align
    tl = jnp.repeat(window_lens.astype(jnp.int32), M)
    tl = jnp.pad(tl, (0, P_pad - P))

    kernel = partial(_hw_kernel, L=L, t_tile=t_tile, n_tiles=n_tiles)
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kernel,
        grid=(P_pad // R, n_tiles),
        in_specs=[
            pl.BlockSpec((R, t_tile), lambda b, s: (b, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, L), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 8), lambda b, s: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_pad, 8), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((R, L), jnp.int32),
            pltpu.VMEM((R, 8), jnp.int32),
        ],
        interpret=interpret,
    )(rc, q, ql[:, None], tl[:, None])
    return out[:P, 0].reshape(B, M)


def resolve_hw_distance():
    """Pallas kernel on real hardware, lax.scan on CPU (same auto rule as
    the other kernels)."""
    if jax.default_backend() == "cpu":
        return hw_distance_batch
    return hw_distance_batch_pallas


def filter_monomers(
    dist_row: np.ndarray, ed_thr: int
) -> np.ndarray:
    """Per-window monomer selection + ordering (src/main.cpp:135-149):
    sort by (distance, input index); keep index 0 (the best) plus every
    subsequent monomer with distance <= ed_thr. Returns the kept original
    indices in DP order."""
    order = np.lexsort((np.arange(len(dist_row)), dist_row))
    keep = [order[0]]
    for idx in order[1:]:
        if dist_row[idx] <= ed_thr:
            keep.append(idx)
    return np.asarray(keep, dtype=np.int32)


@partial(jax.jit, static_argnames=("ed_thr",))
def filter_monomers_device(
    dist: jnp.ndarray,  # [B, M] int32 HW distances
    mono: jnp.ndarray,  # [M, L] int8 monomer codes
    mono_lens: jnp.ndarray,  # [M] int32
    ed_thr: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device-side batched filter_monomers: the (distance, index) ordering
    and keep rule of src/main.cpp:135-149, producing the per-window DP
    monomer tensor ON DEVICE. For large monomer libraries (M >> 24) this
    replaces a host-side [B, M, L] rebuild + upload per batch with two
    argsorts and a row gather that never leave HBM; only the tiny [B, M]
    permutation (for mapping block monomer ids back to input indices)
    returns to the host.

    Returns (mono_w [B, M, L], lens_w [B, M] with dropped rows = 0,
    perm [B, M] original indices in DP order)."""
    B, M = dist.shape
    idx = jnp.arange(M, dtype=jnp.int32)[None, :]
    # ascending (distance, input index) == the reference lexsort
    order = jnp.argsort(dist * jnp.int32(M) + idx, axis=1)
    dist_sorted = jnp.take_along_axis(dist, order, axis=1)
    kept = (idx == 0) | (dist_sorted <= ed_thr)
    # stable-compact kept rows to the front, preserving the sorted order
    order2 = jnp.argsort(jnp.where(kept, 0, jnp.int32(M)) + idx, axis=1)
    perm = jnp.take_along_axis(order, order2, axis=1)
    n_keep = kept.sum(axis=1)
    lens_w = jnp.where(idx < n_keep[:, None], mono_lens[perm], 0)
    return mono[perm], lens_w, perm
