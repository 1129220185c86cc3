"""Validate the NumPy executable spec against reference-binary fixtures.

The fixtures in tests/fixtures/random_cases.json were produced by the
reference dp binary (built from /root/reference at dev time); they pin the
exact raw-TSV behavior — DP scores, traceback tie-breaking, windowing,
postprocessing, and formatting.
"""

import numpy as np
import pytest

from stringdecomposer_tpu.io.fasta import Record, add_reverse_complement, pad_monomers
from stringdecomposer_tpu.ops.oracle import Scoring, align_read_oracle
from stringdecomposer_tpu.report import format_raw_rows


def run_case(case):
    monomers = [Record(n, s) for n, s in case["monomers"]]
    monomers = add_reverse_complement(monomers)
    mono, lens = pad_monomers(monomers)
    sc = Scoring(*case["scoring"])
    reads = case.get("reads") or [["read0", case["read"]]]
    rows = []
    for name, seq in reads:
        blocks = align_read_oracle(
            seq, mono, lens, sc, part_size=case["part_size"], overlap=case["overlap"]
        )
        rows.extend(format_raw_rows(name, blocks, [m.name for m in monomers]))
    return "".join(r + "\n" for r in rows)


def test_random_cases_match_reference(random_cases):
    for idx, case in enumerate(random_cases):
        got = run_case(case)
        assert got == case["raw"], f"case {idx} diverged:\nGOT:\n{got}\nREF:\n{case['raw']}"


@pytest.mark.slow
def test_oracle_on_real_read_window(test_data_dir):
    """One real 5,500 bp window of the CHM13 test read vs the checked-in
    reference raw decomposition (first window's rows, global offset 0)."""
    from stringdecomposer_tpu.io.fasta import load_fasta
    from stringdecomposer_tpu.ops.oracle import decompose_window_oracle
    from stringdecomposer_tpu.io.fasta import encode

    reads = load_fasta(test_data_dir / "read.fa")
    monomers = add_reverse_complement(load_fasta(test_data_dir / "DXZ1_star_monomers.fa"))
    mono, lens = pad_monomers(monomers)
    window = reads[0].seq[:5500]
    blocks = decompose_window_oracle(encode(window), mono, lens)
    # compare against reference raw rows fully inside [0, 5000) — the halo
    # region differs until merged with the next window
    with open(test_data_dir / "raw_decomposition_oracle.tsv") as f:
        ref_rows = [ln.split("\t") for ln in f.read().splitlines()]
    ref_inside = [(r[1], int(r[2]), int(r[3]), float(r[4])) for r in ref_rows if int(r[3]) < 5000]
    names = [m.name for m in monomers]
    got_inside = [
        (names[b.monomer], b.start, b.end, b.identity) for b in blocks if b.end < 5000
    ]
    assert got_inside == ref_inside


def test_postprocess_stream_matches_batch():
    """PostprocessStream must reproduce postprocess() exactly for any chunk
    boundaries, including the >1024-block native-path regime (the streaming
    pipeline relies on prefix emissions being final)."""
    import numpy as np

    from stringdecomposer_tpu.ops.oracle import Block, PostprocessStream, postprocess

    rng = np.random.default_rng(17)
    for n_blocks in [0, 1, 5, 40, 1500]:
        pos = 0
        blocks = []
        for _ in range(n_blocks):
            start = pos - int(rng.integers(0, 30))  # frequent overlaps
            end = start + int(rng.integers(5, 40))
            blocks.append(Block(int(rng.integers(0, 4)), max(0, start), end, 10))
            pos = end
        want = postprocess(list(blocks))
        for chunk in [1, 3, 7, 64, 997]:
            ps = PostprocessStream()
            got = []
            for s in range(0, n_blocks, chunk):
                got.extend(ps.push(blocks[s : s + chunk]))
            got.extend(ps.finish())
            assert got == want, (n_blocks, chunk)
