"""Identity kernel vs reference-edlib fixtures (NW + task=path CIGARs)."""

import re

import numpy as np
import pytest

from stringdecomposer_tpu.io.fasta import encode
from stringdecomposer_tpu.ops.identity import (
    aai_from_counts,
    nw_identity_batch,
    nw_path_spec,
)


def cigar_counts(cigar: str) -> tuple[int, int]:
    """(match_columns, total_columns) from an extended CIGAR, exactly like
    the reference's aai() parsing (main.py:47-59)."""
    total = 0
    n = 0
    for c in cigar:
        if c.isdigit():
            n = n * 10 + int(c)
        else:
            total += n
            n = 0
    matches = sum(int(m[:-1]) for m in re.findall(r"\d+=", cigar))
    return matches, total


def test_spec_matches_edlib_fixtures(edlib_cases):
    for idx, case in enumerate(edlib_cases):
        ed, mt, ln = nw_path_spec(case["q"], case["t"])
        want_mt, want_ln = cigar_counts(case["cigar"])
        assert ed == case["ed"], f"case {idx} distance"
        assert (mt, ln) == (want_mt, want_ln), (
            f"case {idx}: got matches={mt} len={ln}, want {want_mt} {want_ln} "
            f"(q={case['q']} t={case['t']} cigar={case['cigar']})"
        )


def test_batch_kernel_matches_spec(edlib_cases):
    cases = edlib_cases[::7]  # subsample for speed
    Lq = max(len(c["q"]) for c in cases)
    Lt = max(len(c["t"]) for c in cases)
    P = len(cases)
    q = np.zeros((P, Lq), dtype=np.int8)
    t = np.zeros((P, Lt), dtype=np.int8)
    ql = np.zeros(P, dtype=np.int32)
    tl = np.zeros(P, dtype=np.int32)
    for p, c in enumerate(cases):
        q[p, : len(c["q"])] = encode(c["q"])
        ql[p] = len(c["q"])
        t[p, : len(c["t"])] = encode(c["t"])
        tl[p] = len(c["t"])
    D, Mt, Ln = (np.asarray(x) for x in nw_identity_batch(q, ql, t, tl))
    for p, c in enumerate(cases):
        ed, mt, ln = nw_path_spec(c["q"], c["t"])
        assert D[p] == ed and Mt[p] == mt and Ln[p] == ln, f"pair {p}"


def test_aai_reference_op_order():
    # 100*(m/L) with the reference's op order: aai/=total then *100
    assert aai_from_counts(0, 10) == 0.0
    assert aai_from_counts(10, 10) == 100.0
    assert f"{aai_from_counts(157, 170):.2f}" == f"{(157/170)*100:.2f}"
