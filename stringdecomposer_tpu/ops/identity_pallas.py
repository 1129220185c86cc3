"""Batched NW (distance, matches, columns) — systolic wavefront Pallas kernel.

Drop-in accelerator for ops/identity.nw_identity_batch (same contract, same
edlib-traceback-exact co-optimal path semantics — see ops/identity.py for the
up > left > diagonal preference derivation; reference traceback:
/root/reference/stringdecomposer/src/edlib.cpp:945-1144).

Design (v2): anti-diagonal wavefront instead of a column sweep. On one
anti-diagonal d = i + j no cell depends on another, so the within-column
"up"-chain prefix fold (a log2(L)-step roll ladder, ~60 vector ops per
target position in v1) disappears entirely — each step is ~20 vector ops.
The kernel is VMEM-bandwidth bound (time ~ ops x vregs), so fewer ops on the
same tiles is a direct win even though a wavefront takes Lq+Lt steps instead
of Lt. Measured on v5e: ~3.4x over v1 for the finishing-stage shape mix.

Layout: pairs ride sublanes ([R] rows per grid step); QUERY positions ride
lanes, LEFT-aligned (cell (i, j) of diagonal d = i + j lives at lane i), so
every input prep is a static shift — no per-row roll/gather in the XLA
prologue (per-row gathers cost more than the kernel itself at this size):

  up   (i-1, j)   = previous diagonal, lane-1  -> rolled carry  (Ar)
  left (i, j-1)   = previous diagonal, lane    -> carry         (A)
  diag (i-1, j-1) = diagonal d-2,      lane-1  -> rolled carry  (Br = old Ar)

Target chars flow through a circular [R, L] buffer rolled one lane per step
(classic systolic alignment: lane i reads t[d-1-i] on diagonal d; requires
tlen <= L and qlen <= L-2, guaranteed by the wrapper's choice of L).

The capture cell (qlen, tlen) sits at per-pair lane qlen on per-pair
diagonal qlen+tlen: snapshots are written into full-width arrays when
d == qlen+tlen ([R,1] broadcast; slicing a single lane per step would force
a narrow-vector relayout costing ~3x the arithmetic body) and the lane is
extracted once at the end by a masked lane-reduction (no gather).

Two structural savings over v1:
  - matches = columns - distance for ANY unit-cost path (columns =
    ma+mm+ins+del, distance = mm+ins+del), so only (D, Ln) are tracked and
    Ln's update is "+1" for all three moves — no (Mt, Ln) bit-packing.
  - no boundary ops in the loop: with junk lanes initialised to BIG, the
    i=0 / j=0 boundary rows emerge from the recurrence itself (the up /
    left rules reproduce D=d, Ln=d at the wavefront edges, and BIG-valued
    junk — monotone under {+0,+1} updates — can never win a min against
    real scores).
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
T_TILE = 128  # kept for API compat with v1 callers (unused)


def _nw_wavefront_kernel(
    qv_ref,  # [R, L] int32 query chars: lane i holds q[i-1] (lane 0 junk)
    tb_ref,  # [R, L] int32 systolic target buffer for d=1 (see wrapper)
    qlen_ref,  # [R, 1] int32 query lengths (capture lane)
    dsum_ref,  # [R, 1] int32 qlen + tlen (capture diagonal)
    out_ref,  # [R, 8] int32: cols (D, Ln, 0...) at cell (qlen, tlen)
    *,
    L: int,
    n_steps: int,
):
    R = qv_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    qv = qv_ref[...]
    dsum = dsum_ref[...]

    def body(d, carry):
        A, Ar, Br, Pa, Par, Pbr, B, oD, oP = carry
        sub = jnp.where(qv == B, 0, 1)
        up = Ar + 1
        left = A + 1
        diag = Br + sub
        take_up = (up <= left) & (up <= diag)
        take_left = left <= diag
        Dn = jnp.minimum(jnp.minimum(up, left), diag)
        Pn = jnp.where(take_up, Par, jnp.where(take_left, Pa, Pbr)) + 1
        hit = d == dsum
        oD = jnp.where(hit, Dn, oD)
        oP = jnp.where(hit, Pn, oP)
        return (
            Dn, pltpu.roll(Dn, 1, 1), Ar,
            Pn, pltpu.roll(Pn, 1, 1), Par,
            pltpu.roll(B, 1, 1), oD, oP,
        )

    # diagonal 0: cell (0,0) = (D=0, Ln=0) at lane 0; all other lanes BIG
    # junk. Payload junk lanes may hold anything (payloads are carried,
    # never compared); every init mixes in data-dependent values so no
    # carry starts in a replicated vector layout (Mosaic cannot relayout
    # concrete -> replicated at the loop back-edge).
    start = lane == 0
    # junk lanes get BIG + qlen / lane + qlen: the qlen mix keeps the init
    # row-dependent (non-foldable), junk magnitude stays >= BIG
    D0 = jnp.where(start, 0, BIG + qlen_ref[...])
    D0r = pltpu.roll(D0, 1, 1)
    P0 = jnp.where(start, 0, lane + qlen_ref[...])
    P0r = pltpu.roll(P0, 1, 1)
    init = (
        D0, D0r, D0r + BIG,
        P0, P0r, P0r, tb_ref[...], D0 * 0, P0 * 0,
    )
    out = jax.lax.fori_loop(1, n_steps + 1, body, init)
    # extract per-pair lane qlen with a masked lane-reduction (gather-free)
    onehot = lane == qlen_ref[...]
    oD = jnp.sum(jnp.where(onehot, out[7], 0), axis=1, keepdims=True)
    oP = jnp.sum(jnp.where(onehot, out[8], 0), axis=1, keepdims=True)
    out_ref[...] = jnp.concatenate(
        [oD, oP, jnp.zeros((R, 6), jnp.int32)], axis=1
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def nw_identity_batch_pallas(
    q: jnp.ndarray,  # [P, Lq] int codes
    q_lens: jnp.ndarray,  # [P] int32
    t: jnp.ndarray,  # [P, Lt] int codes
    t_lens: jnp.ndarray,  # [P] int32
    pair_tile: int = PAIR_TILE,
    t_tile: int = T_TILE,  # unused; kept for v1 API compat
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Same contract as ops/identity.nw_identity_batch:
    (dist[P], matches[P], columns[P]) of the edlib-preferred co-optimal NW
    alignment per pair.

    Host-side prologue (kept out of jit): the wavefront length is the data's
    actual max(qlen+tlen) rounded up to 32 — up to ~25% fewer steps than the
    padded Lq+Lt would force. Pass NumPy length vectors to keep this free of
    a device sync.
    """
    ql_np = np.asarray(q_lens, dtype=np.int32)
    tl_np = np.asarray(t_lens, dtype=np.int32)
    P, Lq = q.shape
    _, Lt = t.shape
    max_q = int(ql_np.max()) if P else 0
    max_t = int(tl_np.max()) if P else 0
    # +2 (not +1): keeps lane L-1 junk for every pair, so the circular
    # lane-0 <- lane-(L-1) wraparound of the rolls only ever lands on BIG
    # junk and can never contaminate a real cell. The systolic buffer
    # shares the lane array, so L must also hold the longest target.
    L = _round_up(max(max_q + 2, max_t), 128)
    n_steps = _round_up(max(max_q + max_t, 1), 32)
    return _nw_wave_jit(
        q, jnp.asarray(ql_np), t, jnp.asarray(tl_np),
        pair_tile=pair_tile, L=L, n_steps=n_steps,
    )


@partial(jax.jit, static_argnames=("pair_tile", "L", "n_steps"))
def _nw_wave_jit(q, q_lens, t, t_lens, pair_tile, L, n_steps):
    P, Lq = q.shape
    _, Lt = t.shape
    # VMEM budget: ~9 carried [R, L] arrays + 2 inputs, keep under ~8 MB
    fit = max(8, ((8 << 20) // (L * 44)) // 8 * 8)
    R = min(pair_tile, fit, max(8, _round_up(P, 8)))
    P_pad = _round_up(max(P, 1), R)

    # query chars left-aligned with one junk lane in front: lane i = q[i-1]
    qv = jnp.pad(q.astype(jnp.int32), ((0, P_pad - P), (1, max(0, L - Lq - 1))),
                 constant_values=-7)[:, :L]
    ql = jnp.pad(q_lens.astype(jnp.int32), (0, P_pad - P))
    tp = jnp.pad(t.astype(jnp.int32), ((0, P_pad - P), (0, max(0, L - Lt))),
                 constant_values=-9)[:, :L]
    tl = jnp.pad(t_lens.astype(jnp.int32), (0, P_pad - P))
    # systolic target buffer at d=1: lane i reads t[d-1-i] -> B_1[l] =
    # t[(-l) mod L] = reverse(tp) rolled right by one — a static shift,
    # identical for every pair (no per-row gather)
    tb = jnp.roll(tp[:, ::-1], 1, axis=1)

    kernel = partial(_nw_wavefront_kernel, L=L, n_steps=n_steps)
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kernel,
        grid=(P_pad // R,),
        in_specs=[
            pl.BlockSpec((R, L), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, L), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 8), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P_pad, 8), jnp.int32),
        interpret=interpret,
    )(qv, tb, ql[:, None], (ql + tl)[:, None])
    D = out[:P, 0]
    Ln = out[:P, 1]
    return D, Ln - D, Ln
