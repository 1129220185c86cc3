"""Batched NW (distance, matches, columns) — systolic wavefront Pallas kernel.

Drop-in accelerator for ops/identity.nw_identity_batch (same contract, same
edlib-traceback-exact co-optimal path semantics — see ops/identity.py for the
up > left > diagonal preference derivation; reference traceback:
/root/reference/stringdecomposer/src/edlib.cpp:945-1144).

Design (v3): anti-diagonal wavefront. On one anti-diagonal d = i + j no cell
depends on another, so there is no within-column prefix fold at all — and on
this Mosaic build kernels are pltpu.roll-THROUGHPUT bound (wall time ~
const + ~12 ms/roll at [576,256]; elementwise ops fuse into the rolls for
free — see ops/chain_dp_pallas.py's roofline note), so the design minimizes
ROLLED BYTES per step:

  - (D, Ln) ride ONE packed int32 carry (13-bit fields): the per-step
    diagonal shift is one roll instead of two. matches = columns − distance
    for any unit-cost path, so nothing else needs to be carried.
  - target chars ride a 4-PACKED systolic byte buffer: lane l holds the
    chars for steps d..d+3 in one int32, extracted by a static shift in a
    4-substep loop body; the buffer rolls by 4 lanes once per 4 steps
    (0.25 rolls/step instead of 1).
  - net 1.25 rolls/step vs 3 in v2 (~2x measured on the finishing mix).

Layout: pairs ride sublanes ([R] rows per grid step); QUERY positions ride
lanes, LEFT-aligned (cell (i, j) of diagonal d = i + j lives at lane i), so
every input prep is a static shift — no per-row roll/gather in the XLA
prologue:

  up   (i-1, j)   = previous diagonal, lane-1  -> rolled carry  (wAr)
  left (i, j-1)   = previous diagonal, lane    -> carry         (wA)
  diag (i-1, j-1) = diagonal d-2,      lane-1  -> rolled carry  (wBr = old wAr)

The capture cell (qlen, tlen) sits at per-pair lane qlen on per-pair
diagonal qlen+tlen: snapshots are written into a full-width array ([R,1]
broadcast; slicing a single lane per step forces a narrow-vector relayout
costing ~3x the arithmetic body) and the lane is extracted once at the end
by a masked lane-reduction (no gather).

Boundary-free loop: junk lanes hold the max 13-bit D (8191, re-clamped each
step); the i=0 / j=0 boundary rows emerge from the recurrence itself (the
up / left rules reproduce D=d, Ln=d at the wavefront edges, and saturated
junk can never win a min against real scores). Pairs whose wavefront would
exceed the 13-bit field range fall back to the lax.scan backend.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAIR_TILE = 256  # pairs per grid step (sublanes; VMEM-bounded)
T_TILE = 128  # kept for API compat with v1 callers (unused)

FB = 13  # packed field bits: w = (D << FB) | Ln
FMAX = (1 << FB) - 1  # 8191; also the junk-lane D sentinel


def _nw_wavefront_kernel(
    steps_ref,  # [G] int32 scalar-prefetch: fori_loop trip count per tile
    qv_ref,  # [R, L] int32 query chars: lane i holds q[i-1] (lane 0 junk)
    tb_ref,  # [R, L] int32 4-packed target chars for steps 1..4 (see wrapper)
    qlen_ref,  # [R, 1] int32 query lengths (capture lane)
    dsum_ref,  # [R, 1] int32 qlen + tlen (capture diagonal)
    out_ref,  # [R, 8] int32: cols (D, Ln, 0...) at cell (qlen, tlen)
    *,
    L: int,
    n_steps: int,  # multiple of 4; static upper bound (compile key)
):
    R = qv_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    qv = qv_ref[...]
    dsum = dsum_ref[...]

    def substep(d, u, wA, wAr, wBr, B4, oW):
        tch = (B4 >> (8 * u)) & 255
        sub = jnp.where(qv == tch, 0, 1)
        up = (wAr >> FB) + 1
        left = (wA >> FB) + 1
        diag = (wBr >> FB) + sub
        take_up = (up <= left) & (up <= diag)
        take_left = left <= diag
        Dn = jnp.minimum(jnp.minimum(jnp.minimum(up, left), diag), FMAX)
        # Ln clamps too: junk-lane payloads grow +1/step and must never
        # carry into the D field (real Ln <= n_steps < FMAX is unaffected)
        Pn = jnp.minimum(
            (jnp.where(take_up, wAr, jnp.where(take_left, wA, wBr)) & FMAX) + 1,
            FMAX,
        )
        wN = (Dn << FB) | Pn
        oW = jnp.where(d == dsum, wN, oW)
        return wN, pltpu.roll(wN, 1, 1), wAr, oW

    def body(s, carry):
        wA, wAr, wBr, B4, oW = carry
        d = 4 * s + 1
        for u in range(4):
            wA, wAr, wBr, oW = substep(d + u, u, wA, wAr, wBr, B4, oW)
        return wA, wAr, wBr, pltpu.roll(B4, 4, 1), oW

    # diagonal 0: cell (0,0) = (D=0, Ln=0) at lane 0; junk lanes saturate at
    # D=FMAX (monotone under the clamped min). Ln junk grows by +1/step and
    # stays < FMAX by the wrapper's n_steps bound. Inits mix in qlen so no
    # carry starts in a replicated vector layout (Mosaic cannot relayout
    # concrete -> replicated at the loop back-edge).
    start = lane == 0
    w0 = jnp.where(start, 0, (FMAX << FB) | ((lane + qlen_ref[...]) & FMAX))
    w0r = pltpu.roll(w0, 1, 1)
    init = (w0, w0r, w0r | (FMAX << FB), tb_ref[...], w0 * 0)
    # DYNAMIC trip count: this tile only sweeps far enough to capture its
    # own pairs' (qlen + tlen) diagonals (n_steps//4 is the static bound and
    # the compile key; the prefetch value is runtime data). With the wrapper
    # sorting pairs by wavefront length, short-block tiles stop ~25% earlier
    # than the batch max — the 128-granular n_steps no longer taxes every
    # tile for one long outlier block.
    out = jax.lax.fori_loop(0, steps_ref[pl.program_id(0)], body, init)
    # extract per-pair lane qlen with a masked lane-reduction (gather-free)
    onehot = lane == qlen_ref[...]
    oW = jnp.sum(jnp.where(onehot, out[4], 0), axis=1, keepdims=True)
    out_ref[...] = jnp.concatenate(
        [oW >> FB, oW & FMAX, jnp.zeros((R, 6), jnp.int32)], axis=1
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
    actual max(qlen+tlen) rounded up — up to ~25% fewer steps than the
    padded Lq+Lt would force. Pass NumPy length vectors to keep this free of
    a device sync. Pairs beyond the packed 13-bit field range (qlen+tlen >
    8189) fall back to the exact lax.scan backend.
    """
    ql_np = np.asarray(q_lens, dtype=np.int32)
    tl_np = np.asarray(t_lens, dtype=np.int32)
    P, Lq = q.shape
    _, Lt = t.shape
    max_q = int(ql_np.max()) if P else 0
    max_t = int(tl_np.max()) if P else 0
    # +2 (not +1): keeps lane L-1 junk for every pair, so the circular
    # lane-0 <- lane-(L-1) wraparound of the rolls only ever lands on junk
    # and can never contaminate a real cell. The systolic buffer shares the
    # lane array, so L must also hold the longest target (+4 packing slack).
    L = _round_up(max(max_q + 2, max_t + 4), 128)
    # COARSE 128-granularity: n_steps is a compile key, and a fresh Mosaic
    # compile costs ~2 min through this host — the persistent compile cache
    # amortizes the small key menu while the finishing mix keeps a near-
    # tight wavefront (the sweep cost is linear in n_steps).
    n_steps = _round_up(max(max_q + max_t, 1), 128)
    if n_steps + 1 >= FMAX:
        from .identity import nw_identity_batch

        return nw_identity_batch(q, jnp.asarray(ql_np), t, jnp.asarray(tl_np))
    return _nw_wave_jit(
        q, jnp.asarray(ql_np), t, jnp.asarray(tl_np),
        pair_tile=pair_tile, L=L, n_steps=n_steps,
    )


def nw_identity_packed_both(
    read_dev,  # [N] int8 device codes (uploaded once per read)
    starts,    # np [n] block starts (into read_dev)
    lens,      # np [n] block lengths (end - start + 1)
    t_raw_dev,  # [M, Lt] device monomer codes (raw)
    tl_raw,    # np [M] int32
    t_homo_dev,  # [M, Lt_h] device monomer codes (homopolymer-compressed)
    tl_homo,   # np [M] int32
    n_pad: int,
    Lq: int,
) -> jnp.ndarray:
    """Device-side finishing dispatch: extracts the n block substrings from
    the resident read, homopolymer-compresses them ON DEVICE, expands the
    (block x monomer) cross product for both variants, and returns ONE
    packed [2, n_pad * M, 2] int16 array of (D, columns) per (variant,
    pair) — the only device->host transfer of the whole group (the host
    previously uploaded ~2 MB of substring/homo matrices per 4096-block
    group and gathered four int32 arrays; at assembly scale both directions
    ride a ~40 MB/s link). matches = columns - D. Replaces the per-block
    convert_read slicing of the reference (main.py:124-142).

    n_pad (row menu) and Lq (>= max block length, 128-multiple) are the
    caller's canonical compile keys; wavefront sizes derive from the true
    data maxima. Homo lens are only known on device, so the homo sweep uses
    the raw-length bound (collapse never lengthens a sequence)."""
    max_len = int(np.asarray(lens).max()) if len(lens) else 1
    mt_raw = int(np.asarray(tl_raw).max()) if len(tl_raw) else 0
    mt_homo = int(np.asarray(tl_homo).max()) if len(tl_homo) else 0
    L_raw = _round_up(max(max_len + 2, mt_raw + 4, 1), 128)
    L_homo = _round_up(max(max_len + 2, mt_homo + 4, 1), 128)
    ns_raw = _round_up(max(max_len + mt_raw, 1), 128)
    ns_homo = _round_up(max(max_len + mt_homo, 1), 128)
    starts_np = np.zeros(n_pad, dtype=np.int32)
    lens_np = np.zeros(n_pad, dtype=np.int32)
    starts_np[: len(starts)] = starts
    lens_np[: len(lens)] = lens
    return _nw_from_read_both_jit(
        read_dev, jnp.asarray(starts_np), jnp.asarray(lens_np),
        t_raw_dev, jnp.asarray(np.asarray(tl_raw, dtype=np.int32)),
        t_homo_dev, jnp.asarray(np.asarray(tl_homo, dtype=np.int32)),
        Lq=Lq, L_raw=L_raw, L_homo=L_homo, ns_raw=ns_raw, ns_homo=ns_homo,
    )


def _blocks_from_read(read_dev, starts, lens, Lq):
    """[n_pad, Lq] int32 block substrings gathered from the resident read."""
    lane = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    idx = jnp.clip(starts[:, None] + lane, 0, read_dev.shape[0] - 1)
    return jnp.where(lane < lens[:, None], read_dev[idx].astype(jnp.int32), 7)


def _homo_collapse(q, lens, Lq):
    """Run-collapse rows on device: keep first lane + change points, then a
    stable argsort on (dropped, lane) compacts kept chars to the front."""
    lane = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    prev = jnp.roll(q, 1, axis=1)
    keep = ((lane == 0) | (q != prev)) & (lane < lens[:, None])
    order = jnp.argsort(~keep, axis=1, stable=True)
    qh = jnp.take_along_axis(q, order, axis=1)
    hlens = keep.sum(axis=1).astype(jnp.int32)
    return jnp.where(lane < hlens[:, None], qh, 7), hlens


def _cross_product_core(q, lens, targets, t_lens, L, n_steps):
    """(block x monomer) pair expansion + wavefront: [n_pad * M, 2] int32."""
    n_pad = q.shape[0]
    M = targets.shape[0]
    qs = jnp.repeat(q, M, axis=0)
    qls = jnp.repeat(lens, M)
    ts = jnp.tile(targets.astype(jnp.int32), (n_pad, 1))
    tls = jnp.tile(t_lens, n_pad)
    return _nw_wave_core(qs, qls, ts, tls, pair_tile=PAIR_TILE, L=L,
                         n_steps=n_steps)


@partial(jax.jit, static_argnames=("Lq", "L_raw", "L_homo", "ns_raw", "ns_homo"))
def _nw_from_read_both_jit(read_dev, starts, lens, t_raw, tl_raw, t_homo,
                           tl_homo, Lq, L_raw, L_homo, ns_raw, ns_homo):
    # sort blocks by length so each R-pair kernel tile carries pairs of
    # similar wavefront length — combined with the per-tile dynamic trip
    # counts in _nw_wave_core, one long outlier block no longer taxes the
    # whole batch's sweep (block lengths cluster at ~170 bp with a thin
    # tail; measured p99 191 / max 215 on the test read, i.e. 512 vs 384
    # rounded steps). Results are un-permuted on device: bit-identical.
    order = jnp.argsort(lens)  # pad rows (len 0) sort to the front
    starts_s = starts[order]
    lens_s = lens[order]
    q = _blocks_from_read(read_dev, starts_s, lens_s, Lq)
    raw = _cross_product_core(q, lens_s, t_raw, tl_raw, L_raw, ns_raw)
    qh, hlens = _homo_collapse(q, lens_s, Lq)
    homo = _cross_product_core(qh, hlens, t_homo, tl_homo, L_homo, ns_homo)
    M = t_raw.shape[0]
    inv = jnp.argsort(order)
    res = jnp.stack([raw, homo]).reshape(2, -1, M, 2)[:, inv].reshape(2, -1, 2)
    # (D, columns) both <= 8191: one int16 transfer for the whole group
    return res.astype(jnp.int16)


@partial(jax.jit, static_argnames=("pair_tile", "L", "n_steps"))
def _nw_wave_jit(q, q_lens, t, t_lens, pair_tile, L, n_steps):
    out2 = _nw_wave_core(q, q_lens, t, t_lens, pair_tile=pair_tile, L=L,
                         n_steps=n_steps)
    D = out2[:, 0]
    Ln = out2[:, 1]
    return D, Ln - D, Ln


def _nw_wave_core(q, q_lens, t, t_lens, pair_tile, L, n_steps):
    """Traceable core: returns [P, 2] int32 (D, columns) per pair.

    Each R-pair grid tile runs a DYNAMIC number of wavefront steps — enough
    for the largest (qlen + tlen) diagonal among ITS OWN pairs (scalar-
    prefetch trip counts; n_steps stays the static bound / compile key).
    Callers that sort pairs by length (the packed finishing path) therefore
    pay per-tile-max instead of batch-max sweep cost."""
    P, Lq = q.shape
    _, Lt = t.shape
    # VMEM budget: ~6 carried [R, L] arrays + inputs, keep under ~8 MB
    fit = max(8, ((8 << 20) // (L * 32)) // 8 * 8)
    R = min(pair_tile, fit, max(8, _round_up(P, 8)))
    P_pad = _round_up(max(P, 1), R)

    # query chars left-aligned with one junk lane in front: lane i = q[i-1]
    qv = jnp.pad(q.astype(jnp.int32), ((0, P_pad - P), (1, max(0, L - Lq - 1))),
                 constant_values=-7)[:, :L]
    ql = jnp.pad(q_lens.astype(jnp.int32), (0, P_pad - P))
    tp = jnp.pad(t.astype(jnp.int32) & 255,
                 ((0, P_pad - P), (0, max(0, L - Lt))),
                 constant_values=254)[:, :L]
    tl = jnp.pad(t_lens.astype(jnp.int32), (0, P_pad - P))
    # 4-packed systolic buffer for steps 1..4: lane l needs t[d-1-l] at step
    # d, so field u holds t[u-l] -> reverse(tp) rolled right by 1+u, fields
    # OR-ed into one int32 (byte values; 254 pad can never equal a query
    # char, and junk-cell comparisons are harmless anyway)
    rev = tp[:, ::-1]
    tb = (jnp.roll(rev, 1, axis=1)
          | (jnp.roll(rev, 2, axis=1) << 8)
          | (jnp.roll(rev, 3, axis=1) << 16)
          | (jnp.roll(rev, 4, axis=1) << 24))

    # per-tile trip counts: segment max of the capture diagonals (pad rows
    # have dsum 0 and never capture; an all-pad tile runs 0 iterations)
    dsum = ql + tl
    tile_steps = jnp.minimum(
        (dsum.reshape(P_pad // R, R).max(axis=1) + 3) // 4, n_steps // 4
    ).astype(jnp.int32)

    kernel = partial(_nw_wavefront_kernel, L=L, n_steps=n_steps)
    interpret = jax.default_backend() == "cpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P_pad // R,),
        in_specs=[
            pl.BlockSpec((R, L), lambda b, *_: (b, 0)),
            pl.BlockSpec((R, L), lambda b, *_: (b, 0)),
            pl.BlockSpec((R, 1), lambda b, *_: (b, 0)),
            pl.BlockSpec((R, 1), lambda b, *_: (b, 0)),
        ],
        out_specs=pl.BlockSpec((R, 8), lambda b, *_: (b, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P_pad, 8), jnp.int32),
        interpret=interpret,
    )(tile_steps, qv, tb, ql[:, None], dsum[:, None])
    return out[:P, :2]
