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
