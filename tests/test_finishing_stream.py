"""Streaming finishing: bounded-pair flushing must be observationally
identical to one-shot batching, including block-level splits of one read."""

import numpy as np

from stringdecomposer_tpu.finishing import finish_reads
from stringdecomposer_tpu.io.fasta import Record, add_rc_interleaved


def _case():
    rng = np.random.default_rng(3)
    mono = "ACGGTCTGAACTTGGCA"
    monomers = add_rc_interleaved([Record("m", mono)])
    reads = {}
    per_read = []
    for r in range(3):
        seq = "".join(rng.choice(list("ACGT"), size=150))
        name = f"r{r}"
        reads[name] = seq
        blocks = [
            {"m": "m", "start": s, "end": min(s + 16, len(seq) - 1)}
            for s in range(0, 140, 17)
        ]
        per_read.append((name, blocks))
    per_read.append(("r3", []))  # zero-block read
    reads["r3"] = "ACGT"
    return per_read, reads, monomers


def _flat(res):
    return [
        (name, [tuple(vars(b).values()) for b in blocks]) for name, blocks in res
    ]


def test_flush_boundaries_do_not_change_output():
    per_read, reads, monomers = _case()
    big = finish_reads(per_read, reads, monomers, second_best=True)
    assert [n for n, _ in big] == ["r0", "r1", "r2", "r3"]
    for fp in [1, 7, 16, 64]:  # force aggressive split/flush patterns
        small = finish_reads(
            per_read, reads, monomers, second_best=True, flush_pairs=fp
        )
        assert _flat(small) == _flat(big), fp


def test_light_mode_streaming():
    per_read, reads, monomers = _case()
    big = finish_reads(per_read, reads, monomers, second_best=False)
    small = finish_reads(per_read, reads, monomers, second_best=False, flush_pairs=2)
    assert _flat(small) == _flat(big)


def test_duplicate_monomer_names_second_best():
    """The reference collapses scores into a NAME-keyed dict
    (main.py:123-126): with duplicate monomer names the last occurrence's
    score represents the name, every column carrying the best name is
    excluded from second-best, and homo ranking keeps duplicates (it is a
    list, main.py:138-142). Round-2 advisor finding: masking only one
    column let a duplicate of the best name win second-best."""
    reads = {"r": "ACGGTCTGAACTTGGCAACGT"}
    # two monomers named "m" (second occurrence wins the name's score) plus
    # a distinct name; best block is "m"
    monomers = [
        Record("m", "ACGGTCTGAACTTGGCA"),
        Record("x", "TTTTTTTTTTTTTTTTT"),
        Record("m", "ACGGTCTGAACTTGGCT"),
    ]
    per_read = [("r", [{"m": "m", "start": 0, "end": 16}])]
    res = finish_reads(per_read, reads, monomers, second_best=True)
    b = res[0][1][0]
    # second best must be the only OTHER name, however poor — never the
    # duplicate "m" column
    assert b.second_best == "x"
    # the best score is the LAST "m" column's score (dict overwrite), which
    # is 1 mismatch over 17 columns, not the exact-match first column
    assert abs(b.score - (16 / 17) * 100.0) < 1e-9
    # alt dict is name-collapsed, last occurrence wins
    assert set(b.alt) == {"m", "x"}
    assert abs(b.alt["m"] - b.score) < 1e-9
    # homo ranking keeps duplicate-name columns: both "m" variants homo-rank
    # above "x" (homo of best block vs homo monomers)
    assert b.homo_best == "m" and b.homo_second_best == "m"


def test_single_monomer_second_best_is_none():
    """With one distinct monomer name the reference reports
    (None, -1) for second best — not -inf (round-2 advisor finding)."""
    reads = {"r": "ACGGTCTGAACTTGGCA"}
    monomers = [Record("m", "ACGGTCTGAACTTGGCA")]
    per_read = [("r", [{"m": "m", "start": 0, "end": 16}])]
    b = finish_reads(per_read, reads, monomers, second_best=True)[0][1][0]
    assert b.second_best == "None"
    assert b.second_best_score == -1
