"""--precompile (serve warmup): after precompile_menu, a job with NEW read
shapes must not trigger any further kernel compilation — steady-state serve
latency is device time only (round-4 verdict next-step #6)."""

import logging

import jax
import pytest

from stringdecomposer_tpu.pipeline import precompile_menu, run


class _CompileRecorder(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.WARNING)
        self.compiles: list[str] = []

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("Compiling "):
            self.compiles.append(msg)


@pytest.fixture
def recorder():
    rec = _CompileRecorder()
    logger = logging.getLogger("jax._src.interpreters.pxla")
    logger.addHandler(rec)
    old = jax.config.jax_log_compiles
    jax.config.update("jax_log_compiles", True)
    try:
        yield rec
    finally:
        jax.config.update("jax_log_compiles", False if not old else True)
        logger.removeHandler(rec)


def test_precompile_menu_covers_new_job_shapes(tmp_path, recorder):
    unit = "ACGGTCTGAACTTGGCA"
    mono = tmp_path / "m.fa"
    mono.write_text(f">m\n{unit}\n")
    kw = dict(device_batch=4, batch_size=16, overlap=4, second_best=True)

    precompile_menu(str(mono), **kw)
    assert recorder.compiles, "precompile itself must compile the menu"
    recorder.compiles.clear()

    # a job with read lengths the warmup never saw: shorter than a window,
    # window-straddling, and multi-window
    import numpy as np

    rng = np.random.default_rng(3)
    lines = []
    for i, n in enumerate([3, 11, 17, 23, 40, 95]):
        arr = np.array(list((unit * (n // len(unit) + 1))[:n]))
        idx = rng.integers(0, n, max(1, n // 10))
        arr[idx] = rng.choice(list("ACGT"), len(idx))
        lines.append(f">j{i}\n{''.join(arr)}\n")
    seqs = tmp_path / "job.fa"
    seqs.write_text("".join(lines))
    run(str(seqs), str(mono), out_dir=str(tmp_path / "out"), **kw)
    assert recorder.compiles == [], (
        "job after precompile minted compile keys:\n" +
        "\n".join(recorder.compiles))
