"""--stream-reads: bounded-memory streaming runner must be byte-identical
to the one-shot runner, for any group size, light and --second-best."""

import gzip

import numpy as np
import pytest

from stringdecomposer_tpu.pipeline import run


@pytest.fixture
def case(tmp_path):
    rng = np.random.default_rng(17)
    unit = "ACGGTCTGAACTTGGCA"
    seqs = tmp_path / "seqs.fa"
    lines = []
    for i in range(7):
        n = int(rng.integers(30, 200))
        arr = np.array(list((unit * 20)[:n]))
        idx = rng.integers(0, n, max(1, n // 12))
        arr[idx] = rng.choice(list("ACGT"), len(idx))
        lines.append(f">r{i}\n{''.join(arr)}\n")
    seqs.write_text("".join(lines))
    mono = tmp_path / "m.fa"
    mono.write_text(f">m\n{unit}\n")
    return str(seqs), str(mono), tmp_path


def _outs(d):
    return {
        n: open(d / n).read()
        for n in ["final_decomposition.tsv", "final_decomposition_alt.tsv",
                  "final_decomposition_raw.tsv"]
    }


COMMON = dict(batch_size=64, overlap=8, device_batch=4)


@pytest.mark.parametrize("second_best", [False, True])
def test_streaming_matches_oneshot(case, second_best):
    seqs, mono, tmp = case
    run(seqs, mono, out_dir=str(tmp / "one"), second_best=second_best, **COMMON)
    want = _outs(tmp / "one")
    for n in [1, 3, 100]:
        run(seqs, mono, out_dir=str(tmp / f"s{n}"), second_best=second_best,
            stream_reads=n, **COMMON)
        assert _outs(tmp / f"s{n}") == want, n


def test_streaming_gzip(case):
    seqs, mono, tmp = case
    gz = tmp / "seqs.fa.gz"
    with gzip.open(gz, "wt") as f:
        f.write(open(seqs).read())
    run(seqs, mono, out_dir=str(tmp / "plain"), **COMMON)
    run(str(gz), mono, out_dir=str(tmp / "gz"), stream_reads=2, **COMMON)
    assert _outs(tmp / "gz") == _outs(tmp / "plain")


def test_blank_header_no_crash(tmp_path):
    """A '>' header with only whitespace yields an empty-name record instead
    of crashing mid-stream (round-1 advisor finding on io/fasta.py)."""
    from stringdecomposer_tpu.io.fasta import iter_fasta, parse_fasta

    text = ">  \nACGT\n>r2\nTTTT\n"
    p = tmp_path / "blank.fa"
    with open(p, "w") as f:
        f.write(text)
    for recs in (list(iter_fasta(str(p))), parse_fasta(text)):
        assert [r.name for r in recs] == ["", "r2"]
        assert [r.seq for r in recs] == ["ACGT", "TTTT"]
