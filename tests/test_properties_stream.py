"""Randomized equivalence tests for the streaming machinery (round-4
verdict next-step #7): the incremental PostprocessStream and the
--stream-reads runner must be byte-equivalent to their batch counterparts
under ADVERSARIAL shapes — any chunking (including 1-block pushes),
overlap-rule jumps landing exactly on chunk boundaries, reads with zero
windows, duplicate read names, empty reads between real ones.

These are hypothesis-style tests without the dependency: seeded rngs over
many random trials, so failures reproduce deterministically.
Reference semantics under test: src/main.cpp:287-302 (overlap rule incl.
the landing-block quirk) and the in-order flush (src/main.cpp:103-120).
"""

import numpy as np
import pytest

from stringdecomposer_tpu.ops.oracle import Block, PostprocessStream, postprocess


def _random_blocks(rng, n):
    """Block lists biased toward overlap-rule triggers: short blocks right
    after long ones, nested/overlapping spans, equal starts."""
    blocks = []
    pos = 0
    for _ in range(n):
        # mostly forward motion, sometimes heavy overlap with predecessors
        pos += int(rng.integers(-40, 60))
        pos = max(pos, 0)
        ln = int(rng.integers(0, 80))
        blocks.append(Block(int(rng.integers(0, 24)), pos, pos + ln,
                            float(rng.integers(-50, 200))))
    return blocks


def _random_chunking(rng, n):
    cuts = []
    i = 0
    while i < n:
        step = int(rng.choice([1, 1, 2, 3, 5, 6, 7, 13]))
        cuts.append(min(n, i + step))
        i += step
    return cuts


@pytest.mark.parametrize("seed", range(50))
def test_postprocess_stream_equals_batch_any_chunking(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 120))
    blocks = _random_blocks(rng, n)
    want = postprocess(list(blocks))
    for _ in range(4):  # several chunkings of the same list
        pp = PostprocessStream()
        got = []
        prev = 0
        for cut in _random_chunking(rng, n):
            got.extend(pp.push(blocks[prev:cut]))
            prev = cut
        got.extend(pp.finish())
        assert got == want, (seed, n)


def test_postprocess_stream_landing_on_boundary():
    """Force the jump to land exactly one past each push boundary: the
    landing block must be emitted unconditionally when it arrives later."""
    # block 0 covers >half of block 1 -> jump lands on block 2
    blocks = [Block(0, 0, 100, 1.0), Block(1, 10, 20, 1.0),
              Block(2, 300, 310, 1.0), Block(3, 1000, 1010, 1.0),
              Block(4, 2000, 2010, 1.0), Block(5, 3000, 3010, 1.0),
              Block(6, 4000, 4010, 1.0), Block(7, 5000, 5010, 1.0),
              Block(8, 6000, 6010, 1.0)]
    want = postprocess(list(blocks))
    for cut in range(1, len(blocks)):
        pp = PostprocessStream()
        got = pp.push(blocks[:cut]) + pp.push(blocks[cut:]) + pp.finish()
        assert got == want, cut


@pytest.mark.parametrize("seed", range(6))
def test_streaming_runner_equals_oneshot_adversarial(tmp_path, seed):
    """Pipeline-level: random read mixes (zero-window shorties, empty-ish
    reads, duplicate names, exact window-multiple lengths) through
    --stream-reads at several group sizes must reproduce the one-shot
    runner's bytes."""
    from stringdecomposer_tpu.pipeline import run

    rng = np.random.default_rng(1000 + seed)
    unit = "ACGGTCTGAACTTGGCA"
    part, overlap = 64, 8
    lengths = []
    for _ in range(int(rng.integers(3, 8))):
        kind = rng.integers(0, 4)
        if kind == 0:
            lengths.append(int(rng.integers(1, overlap)))  # zero windows
        elif kind == 1:
            lengths.append(part * int(rng.integers(1, 3)))  # exact multiple
        elif kind == 2:
            lengths.append(part + int(rng.integers(0, overlap + 1)))
        else:
            lengths.append(int(rng.integers(20, 300)))
    names = []
    lines = []
    for i, n in enumerate(lengths):
        arr = np.array(list((unit * (n // len(unit) + 1))[:n]))
        idx = rng.integers(0, n, max(1, n // 10))
        arr[idx] = rng.choice(list("ACGT"), len(idx))
        # duplicate names with probability ~1/3
        name = f"r{i}" if rng.random() > 0.33 or not names else names[-1]
        names.append(name)
        lines.append(f">{name}\n{''.join(arr)}\n")
    seqs = tmp_path / "seqs.fa"
    seqs.write_text("".join(lines))
    mono = tmp_path / "m.fa"
    mono.write_text(f">m\n{unit}\n")

    def outs(d):
        return {n: open(d / n).read()
                for n in ["final_decomposition.tsv",
                          "final_decomposition_alt.tsv",
                          "final_decomposition_raw.tsv"]}

    common = dict(batch_size=part, overlap=overlap, device_batch=4,
                  second_best=True)
    run(str(seqs), str(mono), out_dir=str(tmp_path / "one"), **common)
    want = outs(tmp_path / "one")
    for gsz in (1, 2, 100):
        run(str(seqs), str(mono), out_dir=str(tmp_path / f"s{gsz}"),
            stream_reads=gsz, **common)
        assert outs(tmp_path / f"s{gsz}") == want, (seed, gsz)
