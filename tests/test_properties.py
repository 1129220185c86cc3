"""Property tests the reference lacks (SURVEY.md §4): scoring actually
reaches the DP, reverse-complement detection, and batch-size determinism."""

import numpy as np

from stringdecomposer_tpu.io.fasta import Record, add_reverse_complement, reverse_complement
from stringdecomposer_tpu.ops.oracle import Scoring
from stringdecomposer_tpu.pipeline import PipelineConfig, decompose_reads

MONO = "ACGGTCTGAACTTGGCA"


def _blocks(reads, monomers, **cfg_kw):
    cfg = PipelineConfig(part_size=64, overlap=8, device_batch=2, **cfg_kw)
    return decompose_reads(
        [Record(f"r{i}", s) for i, s in enumerate(reads)],
        add_reverse_complement([Record("m", monomers)]),
        cfg,
    )


def test_scoring_scales_identity():
    """Doubling every unit cost must exactly double every DP block score —
    only possible if -s/--scoring reaches the DP (the reference v1.1.2
    silently dropped it, src/main.cpp:381 vs main.py:194)."""
    read = MONO + MONO[:-3] + "T" + MONO
    base = _blocks([read], MONO)
    doubled = _blocks([read], MONO, scoring=Scoring(-2, -2, -2, 2))
    b0 = base[0][1]
    b1 = doubled[0][1]
    assert len(b0) == len(b1) >= 2
    for x, y in zip(b0, b1):
        assert (x.monomer, x.start, x.end) == (y.monomer, y.start, y.end)
        assert y.identity == 2 * x.identity


def test_reverse_complement_monomer_detected():
    rc_read = reverse_complement(MONO) * 2
    res = _blocks([rc_read], MONO)
    blocks = res[0][1]
    assert blocks and all(b.monomer == 1 for b in blocks)  # index 1 = m'

    fwd = _blocks([MONO * 2], MONO)
    assert all(b.monomer == 0 for b in fwd[0][1])
    # mirrored block structure: same count, mirrored coordinates
    n = len(rc_read)
    mirrored = sorted((n - 1 - b.end, n - 1 - b.start) for b in blocks)
    assert mirrored == sorted((b.start, b.end) for b in fwd[0][1])


def test_device_batch_does_not_change_output():
    rng = np.random.default_rng(7)
    reads = ["".join(rng.choice(list("ACGT"), size=200)) for _ in range(5)]
    a = _blocks(reads, MONO)
    cfg_b = PipelineConfig(part_size=64, overlap=8, device_batch=7)
    b = decompose_reads(
        [Record(f"r{i}", s) for i, s in enumerate(reads)],
        add_reverse_complement([Record("m", MONO)]),
        cfg_b,
    )
    assert [(n, [tuple(vars(x).values()) for x in bl]) for n, bl in a] == [
        (n, [tuple(vars(x).values()) for x in bl]) for n, bl in b
    ]


def test_reliability_trainer_roundtrip(tmp_path):
    """models.reliability CLI: refit coefficients that separate a linearly
    separable labeled set, file format identical to the shipped model."""
    from stringdecomposer_tpu.models.reliability import classify, load_coefficients, main

    rng = np.random.default_rng(0)
    rows = []
    for _ in range(400):
        idnt = rng.uniform(50, 100)
        diff = rng.uniform(0, 20)
        label = "+" if (idnt + diff) > 95 else "?"
        rows.append(f"{idnt:.2f}\t{idnt - diff:.2f}\t{label}\n")
    data = tmp_path / "train.tsv"
    data.write_text("".join(rows))
    out = tmp_path / "model.txt"
    assert main([str(data), str(out)]) == 0
    coef = load_coefficients(str(out))
    assert coef.shape == (3,)
    got = classify(np.array([99.0, 60.0]), np.array([80.0, 59.0]), coef)
    assert got[0] and not got[1]


def test_block_record_cap_overflow_recovers():
    """Pathological windows (tiny monomer, long run) overflow the capped
    per-window block records; the pipeline must detect and recompute."""
    read = "T" * 3000
    cfg = PipelineConfig(part_size=3000, overlap=8, device_batch=1)
    res = decompose_reads(
        [Record("r", read)],
        add_reverse_complement([Record("m", "TTTT")]),
        cfg,
    )
    blocks = res[0][1]
    assert len(blocks) == 750  # 3000 / 4: every block emitted, none dropped
    assert blocks[0].start == 0 and blocks[-1].end == 2999
