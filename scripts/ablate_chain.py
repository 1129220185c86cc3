#!/usr/bin/env python3
"""Ablation microbench for the chain-DP Pallas kernel.

Variants toggle individual cost centers (group_max, ladder depth, emit
path, packed shift) to attribute per-step wall time on real hardware.
Numbers are WRONG for ablated variants — timing only. Run uncontended.

Usage: python scripts/ablate_chain.py [variant ...]
Variants: base nochain ladder4 ladder2 noemit noshift chain3d
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

POS_TILE = 128
PACK_PB = 13
PACK_MASK = (1 << PACK_PB) - 1
PACK_BIAS = 1 << 16
NEG = -(1 << 30)


def make_kernel(L, BT, m_pad, pos_tile, variant):
    R = BT * m_pad
    ins, dele, mismatch, match = -1, -1, -1, 1

    def kern(rc_ref, mono_ref, lens_ref, dp0_ref, sp0_ref, end_out, spend_out,
             dp_s, sp_s):
        t_tile = pl.program_id(1)

        @pl.when(t_tile == 0)
        def _():
            dp_s[...] = dp0_ref[...]
            sp_s[...] = sp0_ref[...]

        mono = mono_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        off = L - lens_ref[...]
        valid = lane >= off
        first = lane == off
        k_del = (lane - off) * dele
        lane_del = lane * dele
        rc_tile = rc_ref[...]

        n_ladder = {"ladder4": 4, "ladder2": 2}.get(variant, 8)
        # same-group masks for the subroll segmented max, derived from
        # broadcasted_iota (Mosaic constant-folds iota arithmetic; a captured
        # numpy-backed jax.Array is rejected by pallas_call as a kernel
        # constant, and rolling a gid column per step doubled live
        # narrow-column state and blew the 16 MB scoped-VMEM limit)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        gid_i = row_i // m_pad

        def down_mask(s):
            return (((row_i - s) % R) // m_pad) == gid_i

        def up_mask(s):
            return (((row_i + s) % R) // m_pad) == gid_i

        def pair_cummax_packed(t, p):
            tb = jnp.maximum(t + PACK_BIAS, 0)
            s = 1
            lev = 0
            while s < L and lev < n_ladder:
                v = (tb << PACK_PB) | p
                v_sh = jnp.where(lane >= s, pltpu.roll(v, s, 1), 0)
                tb_sh = v_sh >> PACK_PB
                take = tb_sh >= tb
                tb = jnp.maximum(tb_sh, tb)
                p = jnp.where(take, v_sh & PACK_MASK, p)
                s *= 2
                lev += 1
            return tb - PACK_BIAS, p

        def group_max(end_v):
            if variant == "nochain":
                return end_v  # [R,1] passthrough: no reduce/concat
            if variant in ("subroll", "unroll8", "hoist"):
                # segmented max over m_pad-row groups via masked SUBLANE
                # rolls: down-pass = within-group prefix max, up-pass =
                # within-group suffix max; their elementwise max is the
                # group max at every row (no narrow reduces, no concat)
                x = end_v
                pre, suf = x, x
                s_ = 1
                while s_ < m_pad:
                    pre = jnp.maximum(
                        pre, jnp.where(down_mask(s_), pltpu.roll(pre, s_, 0), NEG)
                    )
                    suf = jnp.maximum(
                        suf, jnp.where(up_mask(s_), pltpu.roll(suf, R - s_, 0), NEG)
                    )
                    s_ *= 2
                return jnp.maximum(pre, suf)
            col = end_v
            parts = []
            for b in range(BT):
                seg = col[b * m_pad : (b + 1) * m_pad, :]
                parts.append(jnp.full((m_pad, 1), jnp.max(seg), dtype=jnp.int32))
            return jnp.concatenate(parts, axis=0)

        def one(i, rc, dp, sp, w, w_sh=None):
            if variant == "noshift":
                dp_sh, sp_sh = dp, sp
            else:
                if w_sh is None:
                    w_sh = pltpu.roll(w, 1, 1)
                dp_sh = (w_sh >> PACK_PB) - PACK_BIAS
                sp_sh = w_sh & PACK_MASK
            mm = jnp.where(mono == rc, match, mismatch)
            chain_i = group_max(dp[:, L - 1 : L])
            enter = chain_i + mm + k_del
            diag = jnp.where(first, NEG, dp_sh + mm)
            insr = dp + ins
            cand = jnp.maximum(enter, jnp.maximum(diag, jnp.where(first, NEG, insr)))
            cand = jnp.where(valid, cand, NEG)
            candstart = jnp.where(
                cand == insr, sp, jnp.where(cand == diag, sp_sh, jnp.asarray(i, jnp.int32))
            )
            tv, sp = pair_cummax_packed(cand - lane_del, candstart)
            dp = tv + lane_del
            w = (jnp.maximum(dp + PACK_BIAS, 0) << PACK_PB) | sp
            return dp, sp, w

        UNROLL = 8 if variant == "unroll8" else 4

        if variant == "hoist":
            # carry roll(w, 1) across substeps: the shift for substep u+1 is
            # issued right after w is formed in substep u, off the critical
            # path of the dependent unpack
            def body(s, carry):
                dp, sp, w, wsh, rc_r, outacc = carry
                i = t_tile * pos_tile + s * UNROLL + 1
                emits = []
                for u in range(UNROLL):
                    dp, sp, w = one(i + u, rc_r[:, u : u + 1], dp, sp, w, wsh)
                    wsh = pltpu.roll(w, 1, 1)
                    emits.append(w[:, L - 1 :])
                outacc = jnp.concatenate([outacc[:, UNROLL:]] + emits, axis=1)
                return dp, sp, w, wsh, pltpu.roll(rc_r, pos_tile - UNROLL, 1), outacc

            dp0v = dp_s[...]
            sp0v = sp_s[...]
            w0 = (jnp.maximum(dp0v + PACK_BIAS, 0) << PACK_PB) | sp0v
            dp, sp, _, _, _, outacc = jax.lax.fori_loop(
                0, pos_tile // UNROLL, body,
                (dp0v, sp0v, w0, pltpu.roll(w0, 1, 1), rc_tile,
                 jnp.zeros((R, pos_tile), jnp.int32)),
            )
        else:
            def body(s, carry):
                dp, sp, w, rc_r, outacc = carry
                i = t_tile * pos_tile + s * UNROLL + 1
                emits = []
                for u in range(UNROLL):
                    dp, sp, w = one(i + u, rc_r[:, u : u + 1], dp, sp, w)
                    emits.append(w[:, L - 1 :])
                if variant == "noemit":
                    outacc = outacc
                else:
                    outacc = jnp.concatenate([outacc[:, UNROLL:]] + emits, axis=1)
                return dp, sp, w, pltpu.roll(rc_r, pos_tile - UNROLL, 1), outacc

            dp0v = dp_s[...]
            sp0v = sp_s[...]
            w0 = (jnp.maximum(dp0v + PACK_BIAS, 0) << PACK_PB) | sp0v
            dp, sp, _, _, outacc = jax.lax.fori_loop(
                0, pos_tile // UNROLL, body,
                (dp0v, sp0v, w0, rc_tile, jnp.zeros((R, pos_tile), jnp.int32)),
            )
        end_out[...] = (outacc >> PACK_PB) - PACK_BIAS
        spend_out[...] = outacc & PACK_MASK
        dp_s[...] = dp
        sp_s[...] = sp

    return kern


@partial(jax.jit, static_argnames=("variant", "BT", "m_pad", "L", "pos_tile"))
def run(rc, mono, lens, dp0, sp0, variant="base", BT=20, m_pad=24, L=256,
        pos_tile=POS_TILE):
    R = BT * m_pad
    n_tiles = rc.shape[1] // pos_tile
    nprog = rc.shape[0] // R
    kern = make_kernel(L, BT, m_pad, pos_tile, variant)
    e, sp = pl.pallas_call(
        kern,
        grid=(nprog, n_tiles),
        in_specs=[
            pl.BlockSpec((R, pos_tile), lambda b, t: (b, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, L), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, L), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, L), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, pos_tile), lambda b, t: (b, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, pos_tile), lambda b, t: (b, t), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rc.shape[0], rc.shape[1]), jnp.int32),
            jax.ShapeDtypeStruct((rc.shape[0], rc.shape[1]), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, L), jnp.int32),
            pltpu.VMEM((R, L), jnp.int32),
        ],
    )(rc, mono, lens, dp0, sp0)
    # reduce on device: the tunnel link is slow, full-output readback would
    # dominate the measurement (first harness version: ~2s of transfer)
    return e.sum() + sp.sum()


def main():
    variants = sys.argv[1:] or ["base", "nochain", "ladder4", "ladder2",
                                "noemit", "noshift"]
    BT, m_pad, L, pos_tile = int(__import__('os').environ.get('ABLATE_BT', 24)), 24, 256, POS_TILE
    nprog = 7  # ~ device_batch 152 / BT
    R = BT * m_pad
    n_tiles = 43  # ~5504 positions
    rng = np.random.default_rng(0)
    mono = rng.integers(0, 4, size=(nprog * R, L), dtype=np.int32)
    lens = np.full((nprog * R, 1), 180, dtype=np.int32)
    dp0 = rng.integers(-200, 0, size=(nprog * R, L), dtype=np.int32)
    sp0 = np.zeros((nprog * R, L), dtype=np.int32)
    steps = n_tiles * pos_tile
    for v in variants:
        rcs = [jnp.asarray(rng.integers(0, 4, size=(nprog * R, steps), dtype=np.int32))
               for _ in range(3)]
        monod, lensd, dp0d, sp0d = map(jnp.asarray, (mono, lens, dp0, sp0))
        # force every input onto the device BEFORE timing (uploads through
        # the tunnel take seconds; np.asarray is the only real sync here)
        for a in rcs + [monod, lensd, dp0d, sp0d]:
            np.asarray(a[:1, :1])
        np.asarray(run(rcs[0], monod, lensd, dp0d, sp0d, variant=v, BT=BT))  # warm
        times = []
        for it in range(6):
            t0 = time.perf_counter()
            e = run(rcs[it % 3], monod, lensd, dp0d, sp0d, variant=v, BT=BT)
            np.asarray(e)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        us_per_step = dt / (nprog * steps) * 1e6
        print(f"{v:10s}  wall={dt*1e3:8.2f} ms   med {us_per_step:6.3f} us/step"
              f"   min {min(times)/(nprog*steps)*1e6:6.3f}")


if __name__ == "__main__":
    main()
