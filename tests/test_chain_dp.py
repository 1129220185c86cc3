"""JAX chain-DP kernel (forward sp-propagation + on-device block walk) vs the
NumPy spec and the reference-binary fixtures."""

import numpy as np
import pytest

from stringdecomposer_tpu.io.fasta import Record, add_reverse_complement, encode, pad_monomers
from stringdecomposer_tpu.ops import oracle
from stringdecomposer_tpu.ops.chain_dp import build_window_batch, chain_dp_forward
from stringdecomposer_tpu.ops.oracle import Scoring
from stringdecomposer_tpu.ops.traceback import blocks_from_device
from stringdecomposer_tpu.pipeline import PipelineConfig, decompose_reads
from stringdecomposer_tpu.report import format_raw_rows


def _pad8(x):
    return (x + 7) // 8 * 8


def _forward_single(codes, mono, lens, sc, debug=False):
    wbatch, wlens = build_window_batch([codes], len(codes))
    return chain_dp_forward(
        wbatch, wlens, mono, lens,
        ins=sc.ins, dele=sc.dele, mismatch=sc.mismatch, match=sc.match,
        return_debug=debug,
    )


def test_forward_matches_oracle_cube(random_cases):
    """chain/end debug arrays of the scan kernel == the NumPy spec's cube."""
    for case in random_cases[:8]:
        monomers = add_reverse_complement([Record(n, s) for n, s in case["monomers"]])
        mono, lens = pad_monomers(monomers, pad_to=_pad8(max(len(m.seq) for m in monomers)))
        sc = Scoring(*case["scoring"])
        seq = case.get("read") or case["reads"][1][1]
        codes = encode(seq[:80])
        dp, chain = oracle.chain_dp_cube(codes, mono, lens, sc)
        _, _, (ch, e, _sp) = _forward_single(codes, mono, lens, sc, debug=True)
        assert np.array_equal(np.asarray(ch[0]), chain)
        ends = np.stack([dp[:, j, lens[j] - 1] for j in range(len(monomers))], axis=1)
        assert np.array_equal(np.asarray(e[0]), ends)


def test_device_blocks_match_oracle(random_cases):
    for idx, case in enumerate(random_cases):
        monomers = add_reverse_complement([Record(n, s) for n, s in case["monomers"]])
        mono, lens = pad_monomers(monomers, pad_to=_pad8(max(len(m.seq) for m in monomers)))
        sc = Scoring(*case["scoring"])
        reads = case.get("reads") or [["read0", case["read"]]]
        for _, seq in reads:
            for off, ln in oracle.make_windows(len(seq), case["part_size"], case["overlap"]):
                codes = encode(seq[off : off + ln])
                want = oracle.decompose_window_oracle(codes, mono, lens, sc)
                blocks, counts = _forward_single(codes, mono, lens, sc)
                got = blocks_from_device(np.asarray(blocks[0]), int(counts[0]))
                assert got == want, f"case {idx} window {off}"


def test_pipeline_matches_reference_raw(random_cases):
    """Full JAX pipeline (batched, padded) == reference binary raw TSV."""
    for idx, case in enumerate(random_cases):
        monomers = add_reverse_complement([Record(n, s) for n, s in case["monomers"]])
        cfg = PipelineConfig(
            scoring=Scoring(*case["scoring"]),
            part_size=case["part_size"],
            overlap=case["overlap"],
            device_batch=3,  # deliberately small to exercise batch padding
        )
        reads = [Record(n, s) for n, s in (case.get("reads") or [["read0", case["read"]]])]
        result = decompose_reads(reads, monomers, cfg)
        rows = []
        names = [m.name for m in monomers]
        for rname, blocks in result:
            rows.extend(format_raw_rows(rname, blocks, names))
        got = "".join(r + "\n" for r in rows)
        assert got == case["raw"], f"case {idx}"


@pytest.mark.slow
def test_full_read_byte_parity(test_data_dir):
    from stringdecomposer_tpu.io.fasta import load_fasta
    from stringdecomposer_tpu.report import write_raw_tsv
    import tempfile, os, filecmp

    reads = load_fasta(test_data_dir / "read.fa")
    monomers = add_reverse_complement(load_fasta(test_data_dir / "DXZ1_star_monomers.fa"))
    result = decompose_reads(reads, monomers, PipelineConfig())
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "raw.tsv")
        write_raw_tsv(out, result, [m.name for m in monomers])
        assert filecmp.cmp(out, test_data_dir / "raw_decomposition_oracle.tsv", shallow=False)
