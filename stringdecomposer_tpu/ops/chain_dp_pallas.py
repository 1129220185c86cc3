"""Chain DP forward — fused Pallas TPU kernel.

Same contract and bit-exact semantics as ops/chain_dp.chain_dp_forward (the
lax.scan reference implementation), but the read-position loop runs inside a
Pallas kernel with the DP column resident in VMEM scratch.

Layout (chosen so every per-step op is a natural [sublane, lane] vector op —
Mosaic supports no lane<->sublane shape casts, and dynamic lane indices must
be 128-aligned):

  - the DP column of BT windows is ONE flat [BT*32, L_pad] int32 tile:
    sublane r = monomer (r % 32) of window (r // 32), lanes = monomer
    positions. 24 real monomers pad to 32 rows; padded rows carry NEG and
    never win any max.
  - grid = (window_tile, position_tile): each grid step consumes a [BT*32,
    128] tile of pre-expanded read chars and produces [BT*32, 128] tiles of
    end-cell scores / start pointers; the 128 positions within a tile are a
    statically-unrolled loop, so every lane index is static. dp/sp state
    lives in VMEM scratch and persists across position tiles.
  - the same-column deletion fold is a log2(L) shift-and-max ladder along
    lanes carrying (score, block-start) pairs with the earliest-tie rule
    (the landing cell of the reference's backward deletion walk,
    src/main.cpp:242-263 — see ops/chain_dp.py for the derivation).
  - the init column i=0 (different recurrence, src/main.cpp:171-182) is a
    tiny jnp prologue outside the kernel.

The on-device block walk is shared with the scan backend
(ops/chain_dp.block_walk).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chain_dp import block_walk

NEG = np.int32(-(1 << 30))
M_PAD = 32  # monomer rows per window, padded to a sublane-tile multiple
POS_TILE = 128  # read positions per grid step (lane-aligned on hardware)


def _dp_kernel(
    rc_ref,  # [R, pos_tile] int32 read chars for i = 1 + t*pos_tile + s
    mono_ref,  # [R, L] int32 monomer codes tiled BT times
    lens_ref,  # [R, 1] int32 monomer lengths tiled BT times (0 on pad rows)
    dp0_ref,  # [R, L] int32 init column (i=0)
    sp0_ref,  # [R, L] int32 init start pointers (all 0)
    end_out,  # [R, POS_TILE] int32
    spend_out,  # [R, POS_TILE] int32
    dp_s,  # scratch [R, L] int32, persists across position tiles
    sp_s,  # scratch [R, L] int32
    *,
    L: int,
    BT: int,
    pos_tile: int,
    ins: int,
    dele: int,
    mismatch: int,
    match: int,
):
    R = BT * M_PAD
    t_tile = pl.program_id(1)

    @pl.when(t_tile == 0)
    def _():
        dp_s[...] = dp0_ref[...]
        sp_s[...] = sp0_ref[...]

    mono = mono_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    end_mask = lane == (lens_ref[...] - 1)  # pad rows: len 0 -> no end cell
    k_del = lane * dele
    rc_tile = rc_ref[...]  # [R, pos_tile]

    def pair_cummax(t, p):
        # prefix max along lanes, ties keep the earliest lane
        s = 1
        while s < L:
            mask = lane >= s
            t_sh = jnp.where(mask, pltpu.roll(t, s, 1), NEG)
            p_sh = jnp.where(mask, pltpu.roll(p, s, 1), 0)
            take = t_sh >= t
            t = jnp.maximum(t_sh, t)
            p = jnp.where(take, p_sh, p)
            s *= 2
        return t, p

    def extract(dp, sp):
        end_v = jnp.max(jnp.where(end_mask, dp, NEG), axis=1, keepdims=True)
        spend_v = jnp.sum(jnp.where(end_mask, sp, 0), axis=1, keepdims=True)
        return end_v, spend_v  # [R, 1]

    def group_max(end_v):
        # per-window max over each 32-row group, broadcast back to the rows
        parts = []
        for b in range(BT):
            seg = end_v[b * M_PAD : (b + 1) * M_PAD, :]
            parts.append(jnp.full((M_PAD, 1), jnp.max(seg), dtype=jnp.int32))
        return jnp.concatenate(parts, axis=0)  # [R, 1]

    dp = dp_s[...]
    sp = sp_s[...]
    end_prev, _ = extract(dp, sp)

    for s in range(pos_tile):  # static unroll; all lane indices static
        i = t_tile * pos_tile + s + 1  # global read position (traced scalar)
        rc = rc_tile[:, s : s + 1]  # [R, 1]
        mm = jnp.where(mono == rc, match, mismatch).astype(jnp.int32)
        chain_i = group_max(end_prev)  # [R, 1]
        enter = chain_i + mm + k_del
        dp_sh = pltpu.roll(dp, 1, 1)
        diag = jnp.where(lane >= 1, dp_sh + mm, NEG)
        sp_sh = pltpu.roll(sp, 1, 1)
        insr = dp + ins  # unmasked: the k==0 equality check is deliberate
        cand = jnp.maximum(enter, jnp.maximum(diag, jnp.where(lane >= 1, insr, NEG)))
        # start-pointer candidate with the reference check order (ins, diag,
        # enter; src/main.cpp:245-257); at landing cells dp == cand.
        candstart = jnp.where(cand == insr, sp, jnp.where(cand == diag, sp_sh, i))
        tv, sp = pair_cummax(cand - k_del, candstart)
        dp = tv + k_del
        end_prev, spend_v = extract(dp, sp)
        end_out[:, s : s + 1] = end_prev
        spend_out[:, s : s + 1] = spend_v

    dp_s[...] = dp
    sp_s[...] = sp


def _init_column(windows, mono_t, lens_t, dele, mismatch, match, BT):
    """Init column i=0 (src/main.cpp:171-182) as plain jnp; [B_pad*32, L]."""
    R_all, L = mono_t.shape[0], mono_t.shape[1]
    lane = jnp.arange(L, dtype=jnp.int32)[None, :]
    rc0 = jnp.repeat(windows[:, 0].astype(jnp.int32), M_PAD)[:, None]
    mm0 = jnp.where(mono_t == rc0, match, mismatch).astype(jnp.int32)
    cand0 = jnp.where(lane >= 1, (lane - 1) * dele + mm0, mm0)
    k_del = lane * dele
    dp0 = jax.lax.cummax(cand0 - k_del, axis=1) + k_del
    sp0 = jnp.zeros_like(dp0)
    end_mask = lane == (lens_t - 1)
    end0 = jnp.max(jnp.where(end_mask, dp0, NEG), axis=1, keepdims=True)
    spend0 = jnp.zeros_like(end0)
    return dp0, sp0, end0, spend0


@partial(
    jax.jit,
    static_argnames=(
        "ins", "dele", "mismatch", "match", "max_blocks", "block_windows", "pos_tile"
    ),
)
def chain_dp_forward_pallas(
    windows: jnp.ndarray,  # [B, W] int8 (READ_PAD-padded)
    window_lens: jnp.ndarray,  # [B] int32
    mono: jnp.ndarray,  # [M, L] int8 (PAD_CODE-padded)
    mono_lens: jnp.ndarray,  # [M] int32
    ins: int = -1,
    dele: int = -1,
    mismatch: int = -1,
    match: int = 1,
    max_blocks: int = 0,
    block_windows: int = 4,  # BT: windows per grid step (VMEM-bounded)
    pos_tile: int = POS_TILE,  # keep 128 on hardware (lane alignment)
):
    """Drop-in replacement for ops/chain_dp.chain_dp_forward."""
    B, W = windows.shape
    # mono may be shared [M, L] or per-window [B, M, L] (ed_thr filter)
    per_window = mono.ndim == 3
    M, L = mono.shape[-2], mono.shape[-1]
    if max_blocks == 0:
        max_blocks = W
    BT = min(block_windows, B)
    B_pad = (B + BT - 1) // BT * BT
    L_pad = (L + 127) // 128 * 128
    nprog = B_pad // BT
    R = BT * M_PAD
    n_tiles = -(-(W - 1) // pos_tile)
    W_in = 1 + n_tiles * pos_tile

    windows_p = jnp.pad(
        windows, ((0, B_pad - B), (0, W_in - W)), constant_values=6
    ).astype(jnp.int32)
    # read chars for i>=1, expanded over monomer rows: [B_pad*32, W_in-1]
    rc = jnp.repeat(windows_p[:, 1:], M_PAD, axis=0)
    if per_window:
        mono_w = jnp.full((B_pad, M_PAD, L_pad), 5, jnp.int8)
        mono_w = mono_w.at[:B, :M, :L].set(mono).astype(jnp.int32)
        lens_w = jnp.zeros((B_pad, M_PAD, 1), jnp.int32).at[:B, :M, 0].set(mono_lens)
    else:
        mono_p = (
            jnp.full((M_PAD, L_pad), 5, jnp.int8).at[:M, :L].set(mono).astype(jnp.int32)
        )
        mono_w = jnp.broadcast_to(mono_p[None], (B_pad, M_PAD, L_pad))
        lens_w = jnp.broadcast_to(
            jnp.zeros((M_PAD, 1), jnp.int32).at[:M, 0].set(mono_lens)[None],
            (B_pad, M_PAD, 1),
        )
    mono_all = mono_w.reshape(B_pad * M_PAD, L_pad)
    lens_all = lens_w.reshape(B_pad * M_PAD, 1)
    dp0, sp0, end0, spend0 = _init_column(
        windows_p, mono_all, lens_all, dele, mismatch, match, BT
    )

    kernel = partial(
        _dp_kernel, L=L_pad, BT=BT, pos_tile=pos_tile,
        ins=ins, dele=dele, mismatch=mismatch, match=match,
    )
    interpret = jax.default_backend() == "cpu"  # CPU tests run interpreted
    end_rest, spend_rest = pl.pallas_call(
        kernel,
        grid=(nprog, n_tiles),
        in_specs=[
            pl.BlockSpec((R, pos_tile), lambda b, t: (b, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, L_pad), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, L_pad), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, L_pad), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, pos_tile), lambda b, t: (b, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, pos_tile), lambda b, t: (b, t), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B_pad * M_PAD, n_tiles * pos_tile), jnp.int32),
            jax.ShapeDtypeStruct((B_pad * M_PAD, n_tiles * pos_tile), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, L_pad), jnp.int32),
            pltpu.VMEM((R, L_pad), jnp.int32),
        ],
        interpret=interpret,
    )(rc, mono_all, lens_all, dp0, sp0)

    end = jnp.concatenate([end0, end_rest], axis=1)[:, :W]
    spend = jnp.concatenate([spend0, spend_rest], axis=1)[:, :W]
    # [B_pad*32, W] -> [B, W, 32]; padded monomer rows have end == NEG and
    # are never chosen by the walk's argmax
    end = end.reshape(B_pad, M_PAD, W)[:B].transpose(0, 2, 1)
    spend = spend.reshape(B_pad, M_PAD, W)[:B].transpose(0, 2, 1)
    return block_walk(end, spend, window_lens, max_blocks)
