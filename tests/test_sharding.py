"""Data-parallel sharding over the 8-device virtual CPU mesh: results must be
bit-identical to the single-device path regardless of device count."""

import jax
import numpy as np
import pytest

from stringdecomposer_tpu.io.fasta import Record, add_reverse_complement
from stringdecomposer_tpu.ops.oracle import Scoring
from stringdecomposer_tpu.parallel.mesh import get_mesh
from stringdecomposer_tpu.parallel.sharding import make_sharded_forward
from stringdecomposer_tpu.pipeline import PipelineConfig, decompose_reads
from stringdecomposer_tpu.report import format_raw_rows


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_matches_reference_fixtures(random_cases, n_dev):
    mesh = get_mesh(jax.devices()[:n_dev])
    fwd = make_sharded_forward(mesh)
    for case in random_cases[:6]:
        monomers = add_reverse_complement([Record(n, s) for n, s in case["monomers"]])
        cfg = PipelineConfig(
            scoring=Scoring(*case["scoring"]),
            part_size=case["part_size"],
            overlap=case["overlap"],
            device_batch=8,
        )
        reads = [Record(n, s) for n, s in (case.get("reads") or [["read0", case["read"]]])]
        result = decompose_reads(reads, monomers, cfg, forward_fn=fwd)
        rows = []
        names = [m.name for m in monomers]
        for rname, blocks in result:
            rows.extend(format_raw_rows(rname, blocks, names))
        got = "".join(r + "\n" for r in rows)
        assert got == case["raw"]


def test_sharded_ed_thr_matches_single_device():
    """data_parallel + --ed_thr: per-window monomer tensors shard on the
    window axis (rank-3 in_specs); output identical to the unsharded run."""
    mesh = get_mesh(jax.devices()[:4])
    fwd = make_sharded_forward(mesh)
    import numpy as np

    rng = np.random.default_rng(41)
    alpha = np.array(list("ACGT"))
    monos = [Record(f"m{j}", "".join(rng.choice(alpha, 12))) for j in range(3)]
    monomers = add_reverse_complement(monos)
    seq = "".join(
        (monos[int(rng.integers(3))].seq for _ in range(40))
    )
    reads = [Record("r0", seq)]
    cfg = PipelineConfig(part_size=64, overlap=8, device_batch=8, ed_thr=4)
    want = decompose_reads(reads, monomers, cfg)
    got = decompose_reads(reads, monomers, cfg, forward_fn=fwd)
    assert [(n, [(b.monomer, b.start, b.end, b.identity) for b in bl]) for n, bl in got] == \
           [(n, [(b.monomer, b.start, b.end, b.identity) for b in bl]) for n, bl in want]


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_identity_kernel_bit_identical(n_dev):
    """make_sharded_identity: the finishing stage's pair batches sharded
    across devices must return bit-identical (dist, matches, columns) to
    the single-device kernel, including non-divisible pair counts."""
    from stringdecomposer_tpu.ops.identity import nw_identity_batch
    from stringdecomposer_tpu.parallel.sharding import make_sharded_identity

    rng = np.random.default_rng(7)
    P = 37  # deliberately not divisible by any device count
    Lq, Lt = 96, 64
    q = rng.integers(0, 4, size=(P, Lq)).astype(np.int8)
    t = rng.integers(0, 4, size=(P, Lt)).astype(np.int8)
    ql = rng.integers(1, Lq + 1, size=P).astype(np.int32)
    tl = rng.integers(1, Lt + 1, size=P).astype(np.int32)
    want = tuple(np.asarray(x) for x in nw_identity_batch(q, ql, t, tl))
    kern = make_sharded_identity(get_mesh(jax.devices()[:n_dev]))
    got = tuple(np.asarray(x) for x in kern(q, ql, t, tl))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_finishing_with_sharded_kernel_byte_identical(tmp_path):
    """End-to-end: run() with both sharded kernels (DP windows + finishing
    pairs) produces byte-identical final/alt TSVs to the unsharded run."""
    from stringdecomposer_tpu.parallel.sharding import make_sharded_identity
    from stringdecomposer_tpu.pipeline import run

    rng = np.random.default_rng(3)
    alpha = np.array(list("ACGT"))
    monos = [Record(f"m{j}", "".join(rng.choice(alpha, 10))) for j in range(2)]
    seq = "".join(monos[int(rng.integers(2))].seq for _ in range(30))
    seqs = tmp_path / "seqs.fa"
    mono_fa = tmp_path / "mono.fa"
    seqs.write_text(f">r0\n{seq}\n>r1\n{seq[:83]}\n")
    mono_fa.write_text("".join(f">{m.name}\n{m.seq}\n" for m in monos))

    run(str(seqs), str(mono_fa), out_dir=str(tmp_path / "single"),
        batch_size=64, overlap=8, second_best=True, device_batch=8)
    run(str(seqs), str(mono_fa), out_dir=str(tmp_path / "sharded"),
        batch_size=64, overlap=8, second_best=True, device_batch=8,
        forward_fn=make_sharded_forward(get_mesh()),
        identity_kernel=make_sharded_identity(get_mesh()))
    for name in ["final_decomposition.tsv", "final_decomposition_alt.tsv",
                 "final_decomposition_raw.tsv"]:
        a = (tmp_path / "single" / name).read_text()
        b = (tmp_path / "sharded" / name).read_text()
        assert a == b, name
