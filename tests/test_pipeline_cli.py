"""End-to-end pipeline + CLI tests (small synthetic case fast; golden slow)."""

import filecmp
import os

import pytest

from stringdecomposer_tpu.cli import main as cli_main


def _write(path, text):
    with open(path, "w") as f:
        f.write(text)


@pytest.fixture
def tiny_case(tmp_path):
    seqs = tmp_path / "seqs.fa"
    mono = tmp_path / "monomers.fa"
    _write(seqs, ">r1\nACGTACGGACGTACGTTACGTACGT\n>r2 with description\nTTTTACGTACGT\n")
    _write(mono, ">mA\nACGTACGT\n>mB\nTTTT\n")
    return str(seqs), str(mono), str(tmp_path)


def test_cli_light_mode(tiny_case):
    seqs, mono, out = tiny_case
    rc = cli_main([seqs, mono, "-o", out, "-b", "16", "-v", "4", "--device-batch", "2"])
    assert rc == 0
    final = os.path.join(out, "final_decomposition.tsv")
    assert os.path.exists(final)
    assert os.path.exists(os.path.join(out, "final_decomposition_raw.tsv"))
    assert os.path.exists(os.path.join(out, "final_decomposition_alt.tsv"))
    assert os.path.exists(os.path.join(out, "stringdecomposer.log"))
    rows = [ln.split("\t") for ln in open(final).read().splitlines()]
    assert rows and all(len(r) == 12 for r in rows)
    # light mode: second-best columns are None/-1.00, alt file empty
    assert all(r[5] == "None" and r[6] == "-1.00" for r in rows)
    assert open(os.path.join(out, "final_decomposition_alt.tsv")).read() == ""
    # r1/r2 both present, input order preserved
    assert rows[0][0] == "r1" and rows[-1][0] == "r2"


def test_cli_second_best_and_min_identity(tiny_case):
    seqs, mono, out = tiny_case
    rc = cli_main(
        [seqs, mono, "-o", out, "-b", "16", "-v", "4", "--second-best",
         "-i", "60", "--device-batch", "2", "--out-file", "sb"]
    )
    assert rc == 0
    rows = [ln.split("\t") for ln in open(os.path.join(out, "sb.tsv")).read().splitlines()]
    assert rows and all(len(r) == 12 for r in rows)
    assert all(float(r[4]) >= 60 for r in rows)  # min-identity filter
    assert all(r[5] != "None" for r in rows)  # second best computed
    alt = [ln.split("\t") for ln in open(os.path.join(out, "sb_alt.tsv")).read().splitlines()]
    assert alt and all(len(r) == 6 for r in alt)
    # alt rows per block = all monomers (2 + 2 RC), best starred
    stars = [r for r in alt if r[5] == "*"]
    assert len(alt) == 4 * len(rows) and len(stars) == len(rows)


def test_cli_invalid_symbol(tmp_path):
    seqs = tmp_path / "bad.fa"
    mono = tmp_path / "m.fa"
    _write(seqs, ">r\nACGTX\n")
    _write(mono, ">m\nACGT\n")
    rc = cli_main([str(seqs), str(mono), "-o", str(tmp_path)])
    assert rc == 255  # reference binary exit(-1) semantics


def test_serve_mode(tiny_case):
    """--serve: one warm process, one job per stdin line, JSON per job."""
    import json
    import subprocess
    import sys as _sys

    seqs, mono, out = tiny_case
    jobs = (
        f"{seqs} {mono} -o {out}/j1 -b 16 -v 4 --device-batch 2\n"
        f"{seqs} {mono} -o {out}/j2 -b 16 -v 4 --device-batch 2 --out-file x\n"
        f"missing.fa {mono} -o {out}/j3\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [_sys.executable, "-m", "stringdecomposer_tpu", "--serve"],
        input=jobs.encode(), capture_output=True, timeout=1200, env=env,
    )
    assert res.returncode == 0, res.stderr.decode()
    lines = [
        json.loads(ln) for ln in res.stdout.decode().splitlines()
        if ln.startswith("{")
    ]
    assert [x["status"] for x in lines] == ["ok", "ok", "error"]
    assert os.path.exists(os.path.join(out, "j1", "final_decomposition.tsv"))
    assert os.path.exists(os.path.join(out, "j2", "x.tsv"))


@pytest.mark.slow
def test_golden_final_tsv(test_data_dir, tmp_path):
    """The reference repo's golden test (Makefile:16-19): --second-best run on
    the CHM13 read must be byte-identical to final_decomposition_fc89af8.tsv."""
    rc = cli_main(
        [
            str(test_data_dir / "read.fa"),
            str(test_data_dir / "DXZ1_star_monomers.fa"),
            "-o", str(tmp_path), "--second-best",
        ]
    )
    assert rc == 0
    assert filecmp.cmp(
        tmp_path / "final_decomposition.tsv",
        test_data_dir / "final_decomposition_fc89af8.tsv",
        shallow=False,
    )


def test_cli_n_symbol_warns_and_runs(tmp_path):
    """N is a real 5th symbol in scoring (src/main.cpp:337-343): run
    succeeds with a warning, N never matches ACGT."""
    seqs = tmp_path / "n.fa"
    mono = tmp_path / "m.fa"
    _write(seqs, ">r\nACGTNNACGTACGT\n")
    _write(mono, ">m\nACGTACGT\n")
    rc = cli_main([str(seqs), str(mono), "-o", str(tmp_path), "-b", "16",
                   "-v", "4", "--device-batch", "2"])
    assert rc == 0
    log = open(tmp_path / "stringdecomposer.log").read()
    assert "contain N symbol" in log
    rows = open(tmp_path / "final_decomposition.tsv").read().splitlines()
    assert rows


def test_cli_lowercase_rejected(tmp_path):
    """The reference binary appends raw lines, so lowercase is a validation
    error (src/main.cpp:330-336)."""
    seqs = tmp_path / "lc.fa"
    mono = tmp_path / "m.fa"
    _write(seqs, ">r\nacgtacgt\n")
    _write(mono, ">m\nACGT\n")
    assert cli_main([str(seqs), str(mono), "-o", str(tmp_path)]) == 255


def test_gzip_fasta_input(tmp_path):
    """gzip FASTA accepted transparently (extension over the reference)."""
    import gzip

    seqs = tmp_path / "seqs.fa.gz"
    mono = tmp_path / "m.fa"
    with gzip.open(seqs, "wt") as f:
        f.write(">r1\nACGTACGTACGTACGT\n")
    _write(mono, ">m\nACGTACGT\n")
    rc = cli_main([str(seqs), str(mono), "-o", str(tmp_path), "-b", "16",
                   "-v", "4", "--device-batch", "2"])
    assert rc == 0
    assert open(tmp_path / "final_decomposition.tsv").read().splitlines()


def test_crash_midrun_preserves_previous_outputs(tiny_case, monkeypatch):
    """All three TSVs build under .tmp and publish by os.replace: a run that
    dies mid-finishing must leave a previous good final TSV untouched and no
    truncated file under any real name (pipeline.py run(): try/finally +
    rename block)."""
    import stringdecomposer_tpu.finishing as fin
    from stringdecomposer_tpu.pipeline import run

    seqs, mono, out = tiny_case
    # a previous good run's outputs
    run(seqs, mono, out_dir=out, device_batch=2, batch_size=16, overlap=4)
    before = {
        n: open(os.path.join(out, n)).read()
        for n in ("final_decomposition.tsv", "final_decomposition_raw.tsv",
                  "final_decomposition_alt.tsv")
    }

    def boom(*a, **k):
        raise RuntimeError("injected mid-finishing crash")

    monkeypatch.setattr(fin, "write_final_rows", boom)
    with pytest.raises(RuntimeError, match="injected"):
        run(seqs, mono, out_dir=out, device_batch=2, batch_size=16, overlap=4)
    for name, text in before.items():
        assert open(os.path.join(out, name)).read() == text, name
    # the stamp was invalidated first: a --resume must recompute, not trust
    # the old raw TSV against the crashed run
    assert not os.path.exists(os.path.join(out, "final_decomposition_raw.tsv.stamp"))


def test_success_leaves_no_tmp_files(tiny_case):
    """Clean runs must publish every output and remove the .tmp builds
    (both the buffered and the streaming path)."""
    from stringdecomposer_tpu.pipeline import run

    seqs, mono, out = tiny_case
    run(seqs, mono, out_dir=out, device_batch=2, batch_size=16, overlap=4)
    assert not [p for p in os.listdir(out) if p.endswith(".tmp")]
    out2 = os.path.join(out, "streamed")
    run(seqs, mono, out_dir=out2, device_batch=2, batch_size=16, overlap=4,
        stream_reads=1)
    assert not [p for p in os.listdir(out2) if p.endswith(".tmp")]
    assert filecmp.cmp(os.path.join(out, "final_decomposition.tsv"),
                       os.path.join(out2, "final_decomposition.tsv"), shallow=False)
