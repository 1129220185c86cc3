"""Batched NW (distance, matches, columns) — fused Pallas TPU kernel.

Drop-in accelerator for ops/identity.nw_identity_batch (same contract, same
edlib-traceback-exact co-optimal path semantics — see ops/identity.py for the
up > left > diagonal preference derivation). The lax.scan version round-trips
its three [P, Lq+1] carries through HBM every target step; here the carries
live in VMEM scratch and each grid step advances a tile of target positions,
so the kernel is ALU-bound like the chain-DP kernel (ops/chain_dp_pallas.py).

Layout mirrors chain_dp_pallas: pairs ride sublanes ([R] rows per grid step),
query positions ride lanes, RIGHT-ALIGNED so the capture cell (query end) of
every pair is the last lane — a static slice, no masked reduction. The
within-column "up" chain folds into a prefix-min ladder over
(D - lane, Mt, Ln - lane) with the earliest-tie rule.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.int32(1 << 28)
PAIR_TILE = 256  # pairs per grid step (sublanes; VMEM-bounded)
T_TILE = 128  # target positions per grid step (unrolled; lane-aligned)


def _nw_kernel(
    tc_ref,  # [R, t_tile] int32 target chars for j = 1 + t*t_tile + s
    q_ref,  # [R, L] int32 query codes, right-aligned (lane off+i = q[i-1])
    qlen_ref,  # [R, 1] int32 query lengths
    tlen_ref,  # [R, 1] int32 target lengths
    out_ref,  # [R, 8] int32: (D, Mt, Ln) captured at j == tlen
    D_s,  # scratch [R, L] int32
    Mt_s,  # scratch [R, L] (holds the packed (Mt, Ln) payload)
    o_s,  # scratch [R, 8]
    *,
    L: int,
    t_tile: int,
    n_tiles: int,
):
    R = q_ref.shape[0]
    t_idx = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    off = L - 1 - qlen_ref[...]  # lane of query position i=0
    i_of = lane - off  # query position at each lane (i >= 0 valid)
    valid = lane >= off
    first = lane == off
    tlen = tlen_ref[...]

    @pl.when(t_idx == 0)
    def _():
        # column j=0: D=i, Mt=0, Ln=i (invalid lanes BIG so they never win);
        # packed payload field = Ln - lane + LN_OFF = (1 << 14) - off
        D0 = jnp.where(valid, i_of, BIG)
        D_s[...] = D0
        Mt_s[...] = jnp.broadcast_to((1 << 14) - off, (R, L))
        # capture for tlen == 0 pairs
        hit0 = tlen == 0
        z = jnp.zeros((R, 1), jnp.int32)
        qv = qlen_ref[...]
        o_s[...] = jnp.concatenate(
            [jnp.where(hit0, qv, 0), z, jnp.where(hit0, qv, 0),
             z, z, z, z, z], axis=1)

    q = q_ref[...]
    # (Mt, Ln) ride the ladder as ONE packed int32 payload: both fields are
    # invariant along an "up" chain when Ln is stored lane-relative
    # (field = Ln - lane + LN_OFF), so the fold carries 2 arrays, not 3.
    # Packing is bijective (payloads are carried, never compared):
    #   packed = (Mt << MT_SHIFT) | (Ln - lane + LN_OFF)
    MT_SHIFT = 16
    LN_OFF = 1 << 14

    def ladder(t, p):
        # prefix min along lanes, ties keep the earliest lane
        s = 1
        while s < L:
            mask = lane >= s
            t_sh = jnp.where(mask, pltpu.roll(t, s, 1), BIG)
            p_sh = jnp.where(mask, pltpu.roll(p, s, 1), 0)
            take = t_sh <= t
            t = jnp.minimum(t_sh, t)
            p = jnp.where(take, p_sh, p)
            s *= 2
        return t, p

    def body(s, carry):
        # fori_loop (not a static unroll: the 128x-unrolled body compiles
        # pathologically slowly); the per-position char column rides a
        # roll-by-1 carry so every lane index stays static
        D, P, o, tc_r = carry
        j = t_idx * t_tile + s + 1  # global target position (traced scalar)
        tchar = tc_r[:, :1]
        sub = jnp.where(q == tchar, 0, 1)  # valid lanes only matter
        leftD = D + 1
        D_sh = pltpu.roll(D, 1, 1)
        P_sh = pltpu.roll(P, 1, 1)
        diagD = jnp.where(first, BIG, D_sh + sub)
        take_left = leftD <= diagD  # left-before-diag tie (edlib traceback)
        candD = jnp.minimum(leftD, diagD)
        # left: Ln+1, same lane -> field+1. diag: Ln+1 at lane+1 -> the
        # rolled field is already correct; only Mt gains (1 - sub).
        candP = jnp.where(take_left, P + 1, P_sh + ((1 - sub) << MT_SHIFT))
        # boundary i=0: D=j, Mt=0, Ln=j -> field = j - off + LN_OFF
        candD = jnp.where(first, j, candD)
        candP = jnp.where(first, j - off + LN_OFF, candP)
        candD = jnp.where(valid, candD, BIG)
        # fold the up-chain (D[i] = min(cand[i], D[i-1]+1)), earliest tie;
        # up moves leave the packed payload untouched by construction
        tv, P = ladder(candD - lane, candP)
        D = tv + lane
        hit = j == tlen
        Pe = P[:, L - 1 :]
        cap = jnp.concatenate(
            [D[:, L - 1 :], Pe >> MT_SHIFT,
             (Pe & ((1 << MT_SHIFT) - 1)) - LN_OFF + (L - 1)], axis=1
        )  # [R, 3] = (dist, matches, columns) at the query end lane
        o = jnp.concatenate([jnp.where(hit, cap, o[:, :3]), o[:, 3:]], axis=1)
        return D, P, o, pltpu.roll(tc_r, t_tile - 1, 1)  # left by 1

    D, P, o, _ = jax.lax.fori_loop(
        0, t_tile, body, (D_s[...], Mt_s[...], o_s[...], tc_ref[...])
    )

    D_s[...] = D
    Mt_s[...] = P
    o_s[...] = o

    @pl.when(t_idx == n_tiles - 1)
    def _():
        out_ref[...] = o


@partial(jax.jit, static_argnames=("pair_tile", "t_tile"))
def nw_identity_batch_pallas(
    q: jnp.ndarray,  # [P, Lq] int codes
    q_lens: jnp.ndarray,  # [P] int32
    t: jnp.ndarray,  # [P, Lt] int codes
    t_lens: jnp.ndarray,  # [P] int32
    pair_tile: int = PAIR_TILE,
    t_tile: int = T_TILE,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Same contract as ops/identity.nw_identity_batch:
    (dist[P], matches[P], columns[P]) of the edlib-preferred co-optimal NW
    alignment per pair."""
    P, Lq = q.shape
    _, Lt = t.shape
    # packed-payload field bounds (see _nw_kernel): Mt < 2^13, Ln span < 2^14
    assert Lq < (1 << 13) and Lq + Lt < (1 << 14), "pair too long for packed ladder"
    # VMEM budget: ~3 scratch columns + query block, ~8 MB of ~16 MB VMEM
    L_fit = (Lq + 1 + 127) // 128 * 128
    fit = max(8, ((8 << 20) // (L_fit * 16)) // 8 * 8)
    R = min(pair_tile, fit, max(8, -(-P // 8) * 8))
    P_pad = -(-P // R) * R
    L = (Lq + 1 + 127) // 128 * 128  # lanes: query column incl. boundary row
    n_tiles = max(1, -(-Lt // t_tile))
    T_in = n_tiles * t_tile

    qp = jnp.pad(q.astype(jnp.int32), ((0, P_pad - P), (0, L - Lq)), constant_values=-7)
    ql = jnp.pad(q_lens.astype(jnp.int32), (0, P_pad - P))
    tp = jnp.pad(
        t.astype(jnp.int32), ((0, P_pad - P), (0, T_in - Lt)), constant_values=-9
    )
    tl = jnp.pad(t_lens.astype(jnp.int32), (0, P_pad - P))
    # right-align queries: lane (L-1-qlen)+i holds q[i-1]
    qp = jax.vmap(lambda r, n: jnp.roll(r, L - n))(qp, ql)

    kernel = partial(_nw_kernel, L=L, t_tile=t_tile, n_tiles=n_tiles)
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
            pltpu.VMEM((R, L), jnp.int32),
            pltpu.VMEM((R, 8), jnp.int32),
        ],
        interpret=interpret,
    )(tp, qp, ql[:, None], tl[:, None])
    return out[:P, 0], out[:P, 1], out[:P, 2]
