"""General batched sequence alignment — full capability parity with the
reference's vendored edlib (src/edlib.h:36-71: modes NW/SHW/HW x tasks
DISTANCE/LOC/PATH, k-threshold, standard+extended CIGAR).

TPU-first design: Myers bit-parallelism (src/edlib.cpp:409-430) is a scalar-
CPU trick with no MXU/VPU analog and is pointless at these sizes; instead the
whole DP column lives in registers/VMEM as one [P, Lq+1] int32 lane vector per
pair, a `lax.scan` walks target positions, and the within-column insertion
chain folds into a prefix-min ladder — so thousands of pairs align per device
step. No banding: the full DP is cheaper than the bookkeeping at batch scale,
and the k-threshold is applied to the exact distance afterwards, preserving
edlib's contract (dist > k => editDistance == -1, src/edlib.h:102-108).

Semantics matched to the reference (validated against 210 reference-generated
fixtures in tests/fixtures/align_cases.json):

  - mode NW: global; endLocations = [|t|-1] (src/edlib.cpp:215-219).
  - mode SHW: target suffix free; all optimal end locations, ascending.
  - mode HW: target prefix+suffix free; per-end start location = the
    SMALLEST start achieving the optimum, via edlib's reversed-SHW rule
    "taking last location as start" (src/edlib.cpp:226-258).
  - task path: alignment/CIGAR for the FIRST (start, end) pair only
    (src/edlib.cpp:269-272), with the traceback's local preference
    up > left > diagonal (src/edlib.cpp:1023-1088) reproduced by forward
    move recording (see ops/identity.py for the equivalence argument).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.int32(1 << 28)

# edlib edit-op codes (src/edlib.h:84-87); I consumes query, D consumes target
EDOP_MATCH, EDOP_INSERT, EDOP_DELETE, EDOP_MISMATCH = 0, 1, 2, 3
_EXT_CHAR = {EDOP_MATCH: "=", EDOP_INSERT: "I", EDOP_DELETE: "D", EDOP_MISMATCH: "X"}
_STD_CHAR = {EDOP_MATCH: "M", EDOP_INSERT: "I", EDOP_DELETE: "D", EDOP_MISMATCH: "M"}


def _encode_any(seq) -> np.ndarray:
    """Arbitrary byte alphabet -> uint8 codes (edlib supports any chars,
    src/edlib.cpp:1420-1459; equality is all the DP ever needs)."""
    if isinstance(seq, np.ndarray):
        return seq.astype(np.uint8)
    if isinstance(seq, bytes):
        return np.frombuffer(seq, dtype=np.uint8)
    return np.frombuffer(str(seq).encode(), dtype=np.uint8)


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("free_target_prefix",))
def dp_lastrow_batch(
    q: jnp.ndarray,  # [P, Lq] uint8/int32 codes
    q_lens: jnp.ndarray,  # [P] int32
    t: jnp.ndarray,  # [P, Lt]
    t_lens: jnp.ndarray,  # [P] int32 (only used by callers for masking)
    free_target_prefix: bool = False,  # True for HW
) -> jnp.ndarray:
    """Last DP row per pair: out[p, j] = dist(q[p][:q_len], t[p][:j]) for
    j = 0..Lt (entries past t_len are garbage; callers mask)."""
    P, Lq = q.shape
    _, Lt = t.shape
    q = q.astype(jnp.int32)
    t = t.astype(jnp.int32)
    i_idx = jnp.arange(Lq + 1, dtype=jnp.int32)
    qcol = jnp.concatenate([jnp.full((P, 1), -1, jnp.int32), q], axis=1)
    qmask = i_idx[None, :] == q_lens[:, None]

    def capture(C):
        return jnp.sum(jnp.where(qmask, C, 0), axis=1)

    C0 = jnp.broadcast_to(i_idx[None, :], (P, Lq + 1))

    def step(C, j):
        tchar = jax.lax.dynamic_index_in_dim(t, j - 1, axis=1, keepdims=False)
        sub = jnp.where(qcol == tchar[:, None], 0, 1)
        left = C + 1
        diag = jnp.concatenate([jnp.full((P, 1), BIG, jnp.int32), C[:, :-1]], axis=1) + sub
        cand = jnp.minimum(left, diag)
        boundary = jnp.int32(0) if free_target_prefix else j
        cand = cand.at[:, 0].set(boundary)
        Cn = jax.lax.cummin(cand - i_idx[None, :], axis=1) + i_idx[None, :]
        return Cn, capture(Cn)

    _, rows = jax.lax.scan(step, C0, jnp.arange(1, Lt + 1, dtype=jnp.int32))
    return jnp.concatenate([capture(C0)[:, None], rows.T], axis=1)  # [P, Lt+1]


@jax.jit
def dp_moves_batch(
    q: jnp.ndarray, q_lens: jnp.ndarray, t: jnp.ndarray, t_lens: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Global-NW move matrix for the PATH task.

    Returns (dist[P], moves[P, Lt+1, Lq+1] uint8) where moves[p, j, i] is the
    traceback step at cell (i, j) under edlib's preference order
    up > left > diag (src/edlib.cpp:1023-1088): EDOP_INSERT consumes a query
    char (up), EDOP_DELETE a target char (left), MATCH/MISMATCH both.
    Boundary rows/columns are handled by the host walker.
    """
    P, Lq = q.shape
    _, Lt = t.shape
    q = q.astype(jnp.int32)
    t = t.astype(jnp.int32)
    i_idx = jnp.arange(Lq + 1, dtype=jnp.int32)
    qcol = jnp.concatenate([jnp.full((P, 1), -1, jnp.int32), q], axis=1)
    qmask = i_idx[None, :] == q_lens[:, None]
    C0 = jnp.broadcast_to(i_idx[None, :], (P, Lq + 1))

    def step(C, j):
        tchar = jax.lax.dynamic_index_in_dim(t, j - 1, axis=1, keepdims=False)
        sub = jnp.where(qcol == tchar[:, None], 0, 1)
        left = C + 1
        diag = jnp.concatenate([jnp.full((P, 1), BIG, jnp.int32), C[:, :-1]], axis=1) + sub
        cand = jnp.minimum(left, diag)
        cand = cand.at[:, 0].set(j)
        Cn = jax.lax.cummin(cand - i_idx[None, :], axis=1) + i_idx[None, :]
        up = jnp.concatenate([jnp.full((P, 1), BIG, jnp.int32), Cn[:, :-1]], axis=1) + 1
        mv = jnp.where(
            up == Cn,
            EDOP_INSERT,
            jnp.where(
                left == Cn,
                EDOP_DELETE,
                jnp.where(sub == 0, EDOP_MATCH, EDOP_MISMATCH),
            ),
        ).astype(jnp.uint8)
        return Cn, (mv, jnp.sum(jnp.where(qmask, Cn, 0), axis=1))

    Cend, (moves, rowvals) = jax.lax.scan(step, C0, jnp.arange(1, Lt + 1, dtype=jnp.int32))
    mv0 = jnp.zeros((1, P, Lq + 1), jnp.uint8) + EDOP_INSERT  # column j=0: up
    moves = jnp.concatenate([mv0, moves], axis=0).transpose(1, 0, 2)  # [P, Lt+1, Lq+1]
    row0 = jnp.sum(jnp.where(qmask, C0, 0), axis=1)
    allrows = jnp.concatenate([row0[:, None], rowvals.T], axis=1)
    dist = jnp.take_along_axis(allrows, t_lens[:, None], axis=1)[:, 0]
    return dist, moves


# ---------------------------------------------------------------------------
# Host assembly
# ---------------------------------------------------------------------------
def _pad_batch(codes: list[np.ndarray], mult: int = 16) -> tuple[np.ndarray, np.ndarray]:
    n = len(codes)
    L = max(1, max((len(c) for c in codes), default=1))
    L = (L + mult - 1) // mult * mult
    arr = np.zeros((n, L), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int32)
    for i, c in enumerate(codes):
        arr[i, : len(c)] = c
        lens[i] = len(c)
    return arr, lens


def _moves_to_cigar(moves: np.ndarray, qlen: int, tlen: int, extended: bool) -> str:
    """Walk moves[j, i] back from (qlen, tlen), emit the CIGAR string
    (run-length, query-perspective; src/edlib.cpp:298-347)."""
    i, j = qlen, tlen
    ops: list[int] = []
    while i > 0 or j > 0:
        if i == 0:
            mv = EDOP_DELETE
        elif j == 0:
            mv = EDOP_INSERT
        else:
            mv = int(moves[j, i])
        ops.append(mv)
        if mv == EDOP_INSERT:
            i -= 1
        elif mv == EDOP_DELETE:
            j -= 1
        else:
            i -= 1
            j -= 1
    ops.reverse()
    chars = _EXT_CHAR if extended else _STD_CHAR
    out: list[str] = []
    pos = 0
    n = len(ops)
    while pos < n:
        c = chars[ops[pos]]
        run = pos
        while run < n and chars[ops[run]] == c:
            run += 1
        out.append(f"{run - pos}{c}")
        pos = run
    return "".join(out)


def align_batch(
    queries: list,
    targets: list,
    mode: str = "NW",
    task: str = "distance",
    k: int = -1,
    cigar_format: str = "extended",
    chunk: int = 4096,
) -> list[dict]:
    """Batched edlibAlign (src/edlib.cpp:141-296): one result dict per pair
    with keys editDistance, endLocations, startLocations, cigar — identical
    values to the reference library (see tests/test_align.py)."""
    assert mode in ("NW", "SHW", "HW")
    assert task in ("distance", "locations", "path")
    P = len(queries)
    assert len(targets) == P
    results: list[dict] = []
    for s in range(0, P, chunk):
        results.extend(
            _align_chunk(
                [_encode_any(x) for x in queries[s : s + chunk]],
                [_encode_any(x) for x in targets[s : s + chunk]],
                mode, task, k, cigar_format,
            )
        )
    return results


def _align_chunk(qs, ts, mode, task, k, cigar_format) -> list[dict]:
    q, ql = _pad_batch(qs)
    t, tl = _pad_batch(ts)
    n = len(qs)
    rows = np.asarray(dp_lastrow_batch(q, ql, t, tl, free_target_prefix=(mode == "HW")))

    dists = np.empty(n, dtype=np.int64)
    ends: list[list[int]] = []
    for p in range(n):
        row = rows[p, : tl[p] + 1]
        if mode == "NW":
            dists[p] = row[tl[p]]
            ends.append([int(tl[p]) - 1])
        else:
            dists[p] = row.min()
            ends.append([int(j) - 1 for j in np.flatnonzero(row == dists[p])])

    # k-threshold contract (src/edlib.h:102-108)
    found = np.ones(n, dtype=bool) if k < 0 else (dists <= k)

    starts: list[list[int] | None] = [None] * n
    if task in ("locations", "path"):
        if mode == "HW":
            # reversed-SHW start derivation, batched over (pair, end) — the
            # smallest optimal start per end (src/edlib.cpp:240-258)
            idx: list[tuple[int, int]] = []
            rqs: list[np.ndarray] = []
            rts: list[np.ndarray] = []
            for p in range(n):
                if not found[p]:
                    continue
                for e in ends[p]:
                    if e >= 0:
                        idx.append((p, e))
                        rqs.append(qs[p][::-1].copy())
                        rts.append(ts[p][e::-1].copy())
            if idx:
                rq, rql = _pad_batch(rqs)
                rt, rtl = _pad_batch(rts)
                rrows = np.asarray(dp_lastrow_batch(rq, rql, rt, rtl))
            for p in range(n):
                if found[p]:
                    starts[p] = [0] * len(ends[p])
            for ii, (p, e) in enumerate(idx):
                row = rrows[ii, : rtl[ii] + 1]
                best_rev = int(np.flatnonzero(row == row.min()).max())  # last location
                starts[p][ends[p].index(e)] = e - (best_rev - 1)
        else:
            for p in range(n):
                if found[p]:
                    starts[p] = [0] * len(ends[p])

    cigars: list[str | None] = [None] * n
    if task == "path":
        # NW path on (q, t[start0:end0+1]) for the first location pair
        idx2: list[int] = []
        pqs: list[np.ndarray] = []
        pts: list[np.ndarray] = []
        for p in range(n):
            if not found[p] or not ends[p]:
                continue
            e0, s0 = ends[p][0], starts[p][0]
            if e0 < 0:
                cigars[p] = f"{len(qs[p])}I" if len(qs[p]) else ""
                continue
            idx2.append(p)
            pqs.append(qs[p])
            pts.append(ts[p][s0 : e0 + 1].copy())
        if idx2:
            pq, pql = _pad_batch(pqs)
            pt, ptl = _pad_batch(pts)
            _, moves = dp_moves_batch(pq, pql, pt, ptl)
            moves = np.asarray(moves)
            for ii, p in enumerate(idx2):
                cigars[p] = _moves_to_cigar(
                    moves[ii], int(pql[ii]), int(ptl[ii]), cigar_format == "extended"
                )

    out = []
    for p in range(n):
        if not found[p]:
            out.append(
                {"editDistance": -1, "endLocations": [], "startLocations": None, "cigar": None}
            )
        else:
            out.append(
                {
                    "editDistance": int(dists[p]),
                    "endLocations": ends[p],
                    "startLocations": starts[p],
                    "cigar": cigars[p],
                }
            )
    return out


def align(query, target, mode: str = "NW", task: str = "distance", k: int = -1) -> dict:
    """Single-pair convenience with the pip-edlib result shape
    (main.py:34 uses align(...)['editDistance'] / ['cigar'])."""
    r = align_batch([query], [target], mode=mode, task=task, k=k)[0]
    if r["editDistance"] == -1:
        return {"editDistance": -1, "locations": [], "cigar": None}
    starts = r["startLocations"] or [None] * len(r["endLocations"])
    return {
        "editDistance": r["editDistance"],
        "locations": list(zip(starts, r["endLocations"])),
        "cigar": r["cigar"],
    }
