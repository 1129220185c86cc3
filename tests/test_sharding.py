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
