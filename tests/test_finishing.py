

def test_threads_byte_identical(tmp_path):
    """-t N must not change output bytes: the thread pool only moves each
    group's encode/dispatch off the caller's thread; gather order is FIFO
    (the reference's OpenMP gather restores order by index the same way,
    src/main.cpp:103-120)."""
    import numpy as np

    from stringdecomposer_tpu.pipeline import run

    rng = np.random.default_rng(9)
    alpha = np.array(list("ACGT"))
    monos = ["".join(rng.choice(alpha, 12)) for _ in range(3)]
    seqs = tmp_path / "s.fa"
    mono_fa = tmp_path / "m.fa"
    reads = []
    for r in range(4):
        reads.append("".join(monos[int(rng.integers(3))] for _ in range(40)))
    seqs.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    mono_fa.write_text("".join(f">m{j}\n{s}\n" for j, s in enumerate(monos)))
    run(str(seqs), str(mono_fa), out_dir=str(tmp_path / "t1"),
        batch_size=64, overlap=8, second_best=True, device_batch=8, threads=1)
    run(str(seqs), str(mono_fa), out_dir=str(tmp_path / "t4"),
        batch_size=64, overlap=8, second_best=True, device_batch=8, threads=4)
    for name in ["final_decomposition.tsv", "final_decomposition_alt.tsv",
                 "final_decomposition_raw.tsv"]:
        a = (tmp_path / "t1" / name).read_text()
        b = (tmp_path / "t4" / name).read_text()
        assert a and a == b, name
