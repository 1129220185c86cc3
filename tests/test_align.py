"""ops/align.py vs 210 reference-edlib-generated fixtures: every mode
(NW/SHW/HW) x task (distance/locations/path), k-thresholds, both CIGAR
formats, byte-equal CIGARs and identical location arrays."""

import json
import pathlib

import pytest

from stringdecomposer_tpu.ops.align import align, align_batch

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def align_cases():
    # two independently seeded reference-edlib fixture sets (420 cases)
    cases = []
    for name in ["align_cases.json", "align_cases_b.json"]:
        with open(FIXTURES / name) as f:
            cases.extend(json.load(f))
    return cases


def _by_mode(cases, mode):
    return [c for c in cases if c["mode"] == mode]


@pytest.mark.parametrize("mode", ["NW", "SHW", "HW"])
def test_path_task_full_parity(align_cases, mode):
    cases = _by_mode(align_cases, mode)
    assert len(cases) >= 60
    res = align_batch(
        [c["q"] for c in cases], [c["t"] for c in cases],
        mode=mode, task="path", k=-1,
    )
    # apply each case's own k afterwards via a second batched call where k>=0
    for c, r in zip(cases, res):
        if c["k"] >= 0:
            r = align_batch([c["q"]], [c["t"]], mode=mode, task="path", k=c["k"])[0]
        assert r["editDistance"] == c["ed"], (c["q"], c["t"])
        if c["ed"] == -1:
            assert r["endLocations"] == [] and r["cigar"] is None
            continue
        assert r["endLocations"] == c["endLocations"], (mode, c["q"], c["t"])
        assert r["startLocations"] == c["startLocations"], (mode, c["q"], c["t"])
        assert r["cigar"] == c["cigar"], (mode, c["q"], c["t"])


def test_standard_cigar(align_cases):
    cases = [c for c in align_cases if c["ed"] >= 0][::5]
    for c in cases:
        r = align_batch([c["q"]], [c["t"]], mode=c["mode"], task="path",
                        cigar_format="standard")[0]
        assert r["cigar"] == c["cigar_std"], (c["mode"], c["q"], c["t"])


def test_distance_task_skips_locations(align_cases):
    c = next(c for c in align_cases if c["mode"] == "HW" and c["ed"] > 0)
    r = align_batch([c["q"]], [c["t"]], mode="HW", task="distance")[0]
    assert r["editDistance"] == c["ed"]
    assert r["endLocations"] == c["endLocations"]
    assert r["startLocations"] is None and r["cigar"] is None


def test_pip_edlib_result_shape(align_cases):
    """align() mirrors the pip edlib dict the reference rescoring consumes
    (main.py:34: align(...)['editDistance'] / ['cigar'])."""
    c = next(c for c in align_cases if c["mode"] == "NW" and c["ed"] > 0)
    r = align(c["q"], c["t"], mode="NW", task="path")
    assert r["editDistance"] == c["ed"]
    assert r["cigar"] == c["cigar"]
    assert r["locations"] == [(0, len(c["t"]) - 1)]
