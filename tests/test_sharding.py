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
