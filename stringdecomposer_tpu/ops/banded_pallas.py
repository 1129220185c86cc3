"""Fused banded-NW sweep kernel (Pallas): the Ukkonen band in VMEM.

The general alignment API's banded primitives (`align.dp_banded_nw_batch`,
`align.dp_banded_lastrow_batch`) carry a [P, 2k+1] band across target
columns with a lax.scan. That is contract-correct but leaves throughput on
the table: every scan step re-reads the band carry and the two character
streams through XLA's while-loop machinery, and the within-column
insertion chain costs a lane-axis `lax.cummin` per column. This module is
the same recurrence as ONE fused Pallas program: the band, its capture
column, and the sliding query window live in VMEM scratch across a grid
over target-column tiles, each tile processed by a fori_loop whose body is
a handful of `pltpu.roll`s (the proven chain-DP kernel recipe,
`ops/chain_dp_pallas.py`: lane-roll character feeds, roll-ladder prefix
fold, 4x-unrolled body so the streamed tiles roll once per body).

Semantics transcribed from nothing: this computes the classic banded
Needleman-Wunsch distance column (the recurrence edlib implements
bit-parallel in myersCalcEditDistanceNW, reference
stringdecomposer/src/edlib.cpp:547-571 and its Hirschberg callers
edlib.cpp:1234-1400); parity is asserted against `dp_banded_lastrow_batch`
(itself fixture-verified) in tests/test_banded_pallas.py.

Returns, like `dp_banded_lastrow_batch`, the FINAL target column of the
banded DP: out[p, b] = dist(q[p][:i], t[p][:t_len]) at row i = t_len + b
- k, BIG outside [0, q_len] / outside the band. The single-distance
contract (`dp_banded_nw_batch`) is the lane b = q_len - t_len + k of the
same column, so one kernel serves both callers (see `banded_final_column`
wrappers in ops/align.py).

Routing is env-gated until hardware-measured: SDTPU_BANDED_BACKEND =
"scan" (default) | "pallas" | "auto" (pallas where supported), read once
at import like SDTPU_GROUP_MODE.
"""

from __future__ import annotations

import os as _os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 28  # matches ops/align.BIG
COL_TILE = 128  # target columns per grid step (lane-aligned)

# resolved ONCE at import: a trace-time read would be frozen into the jit
# cache under the default argument — per-process A/B only
DEFAULT_BACKEND = _os.environ.get("SDTPU_BANDED_BACKEND", "scan")


def _kernel(
    t_ref,  # [Pp, COL_TILE] target chars, tile g covers columns g*CT..+CT
    qin_ref,  # [Pp, COL_TILE] q chars entering the band window, same tiling
    qb0_ref,  # [Pp, BwP] initial band window of q chars (columns at j=1)
    d0_ref,  # [Pp, BwP] initial band values (target column 0)
    qlen_ref,  # [Pp, 1] int32
    tlen_ref,  # [Pp, 1] int32
    cap_out,  # [Pp, BwP] captured final column
    d_s,  # scratch: band carry
    cap_s,  # scratch: capture carry
    qb_s,  # scratch: sliding q window
    *,
    Bw: int,
    BwP: int,
    k: int,
    Pp: int,
    col_tile: int,
    use_mask: bool,
):
    g = pl.program_id(0)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (Pp, BwP), 1)
    qlen = qlen_ref[...]
    tlen = tlen_ref[...]

    @pl.when(g == 0)
    def _():
        d_s[...] = d0_ref[...]
        qb_s[...] = qb0_ref[...]
        # t_len == 0 pairs capture the initial column (no target chars)
        cap_s[...] = jnp.where(tlen == 0, d0_ref[...], BIG)

    def sub_row(qb, tchar):
        # substitution cost along the band: 0 where "equal". mask mode:
        # qb holds per-row equality bitmasks, tchar compact symbol ids
        # (align._sub_fn's vector-shift trick; alphabets <= 32 symbols)
        if use_mask:
            return 1 - ((qb >> tchar) & 1)
        return jnp.where(qb == tchar, 0, 1)

    def one(j, tchar, inc, d, cap, qb):
        i_here = j + b_idx - k
        left = pltpu.roll(d, BwP - 1, 1) + 1  # lane b <- band row above (b+1)
        diag = d + sub_row(qb, tchar)
        cand = jnp.minimum(left, diag)
        cand = jnp.where(i_here == 0, j, cand)  # NW boundary row enters
        valid = (i_here >= 0) & (i_here <= qlen) & (b_idx < Bw)
        cand = jnp.where(valid, cand, BIG)
        # within-column insertion chain d[b] <- min(d[b], d[b'] + (b - b'))
        # as a min-plus roll ladder (prefix fold after the -b_idx rebase)
        v = cand - b_idx
        s = 1
        while s < BwP:
            v = jnp.minimum(v, jnp.where(b_idx >= s, pltpu.roll(v, s, 1), BIG))
            s *= 2
        d = jnp.where(valid, v + b_idx, BIG)
        cap = jnp.where(j == tlen, d, cap)
        # slide the q window one row: lanes shift down, incoming char on top
        qb = jnp.where(
            b_idx == BwP - 1, inc, pltpu.roll(qb, BwP - 1, 1)
        )
        return d, cap, qb

    UNROLL = 4 if col_tile % 4 == 0 else 1

    def body(s, carry):
        d, cap, qb, t_r, q_r = carry
        j0 = g * col_tile + s * UNROLL + 1
        for u in range(UNROLL):
            d, cap, qb = one(
                j0 + u, t_r[:, u : u + 1], q_r[:, u : u + 1], d, cap, qb
            )
        return (
            d, cap, qb,
            pltpu.roll(t_r, col_tile - UNROLL, 1),
            pltpu.roll(q_r, col_tile - UNROLL, 1),
        )

    d, cap, qb, _, _ = jax.lax.fori_loop(
        0, col_tile // UNROLL, body,
        (d_s[...], cap_s[...], qb_s[...], t_ref[...], qin_ref[...]),
    )
    d_s[...] = d
    cap_s[...] = cap
    qb_s[...] = qb
    cap_out[...] = cap


@partial(jax.jit, static_argnames=("k", "use_mask"))
def banded_final_column_pallas(
    q: jnp.ndarray,  # [P, Lq] codes (equality bitmasks if use_mask)
    q_lens: jnp.ndarray,  # [P] int32
    t: jnp.ndarray,  # [P, Lt] codes (symbol ids if use_mask)
    t_lens: jnp.ndarray,  # [P] int32
    k: int,
    use_mask: bool = False,
) -> jnp.ndarray:
    """Pallas drop-in for align.dp_banded_lastrow_batch (eq_flat unsupported
    — the lut gather stays on the scan backend). Returns [P, 2k+1]."""
    P, Lq = q.shape
    _, Lt = t.shape
    Bw = 2 * k + 1
    BwP = -(-Bw // 128) * 128
    Pp = max(8, -(-P // 8) * 8)
    n_tiles = max(1, -(-Lt // COL_TILE))
    Ltp = n_tiles * COL_TILE

    q = q.astype(jnp.int32)
    t = t.astype(jnp.int32)
    pad_code = 0 if use_mask else -1
    # qp[j + b] = q char of band row i_here = j + b - k at column j
    # (original q index i_here - 1), junk-padded so slices never clamp
    qp = jnp.pad(
        q, ((0, Pp - P), (k + 1, BwP + Ltp)), constant_values=pad_code
    )
    qb0 = qp[:, 1 : 1 + BwP]
    qin = qp[:, 1 + BwP : 1 + BwP + Ltp]  # char entering the window at col j
    tp = jnp.pad(t, ((0, Pp - P), (0, Ltp - Lt)))
    qlp = jnp.pad(q_lens.astype(jnp.int32), (0, Pp - P))[:, None]
    # padded rows: t_len = -1 so they never capture (j >= 1 always)
    tlp = jnp.pad(
        t_lens.astype(jnp.int32), (0, Pp - P), constant_values=-1
    )[:, None]

    b_idx = jnp.arange(BwP, dtype=jnp.int32)[None, :]
    i0 = b_idx - k
    d0 = jnp.where((i0 >= 0) & (i0 <= qlp) & (b_idx < Bw), i0, BIG)
    d0 = jnp.broadcast_to(d0, (Pp, BwP)).astype(jnp.int32)

    kern = partial(
        _kernel, Bw=Bw, BwP=BwP, k=k, Pp=Pp, col_tile=COL_TILE,
        use_mask=use_mask,
    )
    interpret = jax.default_backend() == "cpu"  # CPU tests run interpreted
    cap = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Pp, COL_TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, COL_TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, BwP), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, BwP), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Pp, BwP), lambda g: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, BwP), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((Pp, BwP), jnp.int32),
            pltpu.VMEM((Pp, BwP), jnp.int32),
            pltpu.VMEM((Pp, BwP), jnp.int32),
        ],
        interpret=interpret,
    )(tp, qin, qb0, d0, qlp, tlp)
    return jnp.minimum(cap[:P, :Bw], BIG)


def supported(P: int, Lq: int, Lt: int, k: int, eq_flat) -> bool:
    """True when the Pallas route can serve this call: no lut-mode gather,
    non-degenerate shapes, and the band tiles fit the VMEM budget."""
    if eq_flat is not None or Lt == 0:
        return False
    Bw = 2 * k + 1
    BwP = -(-Bw // 128) * 128
    Pp = max(8, -(-P // 8) * 8)
    # 4 band-width tiles (d, cap, qb, out) + 2 column tiles, int32
    vmem = Pp * (4 * BwP + 2 * COL_TILE) * 4
    return vmem <= (8 << 20)
