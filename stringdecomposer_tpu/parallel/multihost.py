"""Multi-host execution: per-host read sharding + deterministic TSV merge.

The reference is single-node (SURVEY.md §2: OpenMP threads + one fork/exec,
no network communication). The TPU-native scale-out model replaces that with:

  - `jax.distributed.initialize` for process topology (parallel/mesh.py);
  - reads sharded across hosts round-robin by input index — DCN carries only
    input distribution, never DP traffic (windows are independent by
    construction of the halo chunking scheme, src/main.cpp:73-75);
  - each host runs the ordinary single-host pipeline on its local devices
    (data-parallel window sharding within the host via parallel/sharding.py)
    and writes a raw-TSV *fragment* plus a `.done` sentinel — the fragment
    is a per-host checkpoint, so a failed run resumes per host;
  - host 0 merges fragments by global read index, reproducing the
    reference's order-restoring sort (src/main.cpp:103-120) across hosts:
    output bytes are identical to a single-host run for any host count.

No collective rides the output path; the merge is pure filesystem, so the
same code runs under real `jax.distributed` on a pod slice or as plain
processes in tests.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass

logger = logging.getLogger("SD-TPU")


@dataclass
class HostTopology:
    num_hosts: int = 1
    host_id: int = 0


def detect_topology() -> HostTopology:
    """Topology from an initialized jax.distributed runtime (1 host if
    uninitialized)."""
    import jax

    return HostTopology(num_hosts=jax.process_count(), host_id=jax.process_index())


def shard_indices(n_reads: int, topo: HostTopology) -> list[int]:
    """Global read indices owned by this host (round-robin by input index,
    the multi-host analog of the reference's chunk interleaving)."""
    return list(range(topo.host_id, n_reads, topo.num_hosts))


def fragment_path(out_dir: str, out_file: str, host_id: int) -> str:
    return os.path.join(out_dir, f"{out_file}_raw.shard{host_id:05d}.tsv")


def _sentinel(frag: str) -> str:
    return frag + ".done"


def _sentinel_matches(path: str, fingerprint: str) -> bool:
    """True iff the sentinel exists and was written for `fingerprint`.

    Checking content (not mere existence) means a stale sentinel from a
    previous run with different inputs — or one mid-rewrite by another
    host — never admits its fragment into the merge."""
    try:
        with open(path) as f:
            return f.read().strip() == fingerprint
    except OSError:
        return False


_HEARTBEAT_PERIOD = 10.0


def _heartbeat(frag: str) -> str:
    return frag + ".alive"


class _HeartbeatThread:
    """Touches the host's `.alive` file every few seconds while the DP
    stage runs, so host 0 can distinguish 'still computing' from 'dead'.
    (A fragment file is only written at stage end, so its size carries no
    liveness signal during compute.)"""

    def __init__(self, frag: str, period: float = _HEARTBEAT_PERIOD):
        import threading

        self._path = _heartbeat(frag)
        self._period = period
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                with open(self._path, "w") as f:
                    f.write(str(time.time()))
            except OSError:
                pass
            self._stop.wait(self._period)

    def __enter__(self) -> "_HeartbeatThread":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)
        # a left-behind .alive from a finished run would bypass the
        # "never-heartbeated -> grace from wait start" fallback on the NEXT
        # run into the same out_dir and get a healthy host declared dead
        try:
            os.remove(self._path)
        except OSError:
            pass


def _wait_for(
    paths: list[str],
    fingerprint: str,
    timeout: float = 3600.0,
    poll: float = 0.2,
    liveness_grace: float = 120.0,
    salvage: bool = False,
) -> list[str]:
    """Block until every sentinel exists with the current fingerprint.

    Dead-host detection: a host whose sentinel is missing AND whose
    heartbeat file has not been touched for `liveness_grace` seconds is
    declared dead. With salvage=False host 0 fails fast with a message
    naming it (instead of silently burning the whole `timeout`); with
    salvage=True the stalled sentinel paths are RETURNED so the caller can
    recompute those shards itself. A host that never wrote a heartbeat
    gets the same grace measured from when the wait began (covers
    startup/compile skew). The reference has no multi-host story at all
    (src/main.cpp:103-120 is single-process)."""
    start_wall = time.time()
    deadline = time.monotonic() + timeout
    missing = list(paths)
    while missing:
        missing = [p for p in missing if not _sentinel_matches(p, fingerprint)]
        if not missing:
            return []
        now_wall = time.time()
        stalled = []
        for p in missing:
            hb = _heartbeat(p[: -len(".done")])
            try:
                last = os.path.getmtime(hb)
            except OSError:
                last = start_wall
            if now_wall - last > liveness_grace:
                stalled.append(p)
        if stalled:
            if salvage:
                return stalled
            hosts = ", ".join(
                p.rsplit(".shard", 1)[1].split(".")[0].lstrip("0") or "0"
                for p in stalled
            )
            raise RuntimeError(
                f"host(s) {hosts} appear dead: no heartbeat for "
                f"{liveness_grace:.0f}s (sentinels still missing: {stalled}). "
                "Re-run with --resume to recompute only the missing fragments."
            )
        if time.monotonic() > deadline:
            raise TimeoutError(f"timed out waiting for host fragments: {missing}")
        time.sleep(poll)
    return []


def merge_raw_fragments(
    out_dir: str, out_file: str, topo: HostTopology, n_reads: int
) -> str:
    """Interleave per-host fragments back into global read order.

    Each fragment holds its host's reads in ascending global index (the
    single-host pipeline preserves input order), so the merge is one
    sequential pass per fragment — the cross-host version of the
    reference's index re-sort (src/main.cpp:103-120). The pass is fully
    streaming: one open file handle per host, rows copied line-by-line,
    so merge memory is O(num_hosts), flat in the input size (a centromere
    assembly's raw TSV can be many GB).
    """
    # the sidecar written next to each fragment records exact per-read row
    # counts, so zero-block reads and duplicate read names merge unambiguously
    counts: list[list[int]] = []
    handles = []
    try:
        for h in range(topo.num_hosts):
            frag = fragment_path(out_dir, out_file, h)
            with open(frag + ".reads") as f:
                counts.append(
                    [int(ln.rsplit("\t", 1)[1]) for ln in f.read().split("\n")[:-1]]
                )
            handles.append(open(frag))

        cursors = [0] * topo.num_hosts
        raw_path = os.path.join(out_dir, out_file + "_raw.tsv")
        with open(raw_path + ".tmp", "w") as out:
            for gi in range(n_reads):
                h = gi % topo.num_hosts
                for _ in range(counts[h][cursors[h]]):
                    out.write(handles[h].readline())
                cursors[h] += 1
    finally:
        for fh in handles:
            fh.close()
    os.replace(raw_path + ".tmp", raw_path)
    return raw_path


def run_multihost(
    sequences_path: str,
    monomers_path: str,
    out_dir: str = ".",
    out_file: str = "final_decomposition",
    min_identity: int = 0,
    scoring: str = "-1,-1,-1,1",
    batch_size: int = 5000,
    overlap: int = 500,
    second_best: bool = False,
    ed_thr: int = -1,
    device_batch: int = 16,
    topology: HostTopology | None = None,
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    resume: bool = False,
    data_parallel: bool = False,
    barrier_timeout: float = 3600.0,
    liveness_grace: float = 120.0,
    salvage_dead_hosts: bool = True,
) -> str | None:
    """Full pipeline across hosts. Returns the final TSV path on host 0,
    None on other hosts.

    If `coordinator` is given, `jax.distributed` is initialized and the
    topology is taken from it; otherwise `topology` (or single-host) is
    used, which lets plain processes cooperate through the shared out_dir.
    With `resume=True` a host whose fragment sentinel already exists skips
    its DP stage entirely (per-host checkpoint/restart).
    """
    import pathlib

    from ..finishing import finish_reads, write_final_tsv
    from ..io.fasta import add_rc_interleaved, add_reverse_complement, load_fasta, validate_acgtn
    from ..ops.oracle import Scoring
    from ..pipeline import PipelineConfig, decompose_reads
    from ..report import parse_raw_tsv, write_raw_tsv
    from .mesh import initialize_distributed

    if coordinator is not None:
        initialize_distributed(coordinator, num_processes, process_id)
        topology = detect_topology()
        if (num_processes or 1) > 1 and topology.num_hosts == 1:
            # runtimes that cannot aggregate processes into one device view
            # still gave us a working coordination barrier; fall back to the
            # explicit topology so hosts never race on the same fragment
            logger.warning(
                "jax.distributed reports a single process; using explicit "
                "topology %s/%s", process_id, num_processes,
            )
            topology = HostTopology(num_processes, process_id or 0)
    topo = topology or HostTopology()
    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)

    reads = load_fasta(sequences_path)
    monomers_fwd = load_fasta(monomers_path)
    validate_acgtn(reads, sequences_path)
    validate_acgtn(monomers_fwd, monomers_path)
    monomers_dp = add_reverse_complement(monomers_fwd)

    from ..pipeline import stage_fingerprint

    fp = stage_fingerprint(
        sequences_path, monomers_path, scoring, batch_size, overlap, ed_thr
    )
    frag = fragment_path(out_dir, out_file, topo.host_id)
    resumable = False
    if resume and os.path.exists(_sentinel(frag)):
        with open(_sentinel(frag)) as f:
            resumable = f.read().strip() == fp
        if not resumable:
            logger.warning(
                "--resume: host %d fragment was produced from different "
                "inputs; recomputing", topo.host_id,
            )
    ins, dele, mm, match = (int(x) for x in scoring.split(","))
    cfg = PipelineConfig(
        scoring=Scoring(ins, dele, mm, match),
        part_size=batch_size,
        overlap=overlap,
        device_batch=device_batch,
        ed_thr=ed_thr,
    )
    forward_fn = None
    if data_parallel:
        from .sharding import make_sharded_forward

        forward_fn = make_sharded_forward()

    def compute_shard(host_id: int) -> None:
        """DP stage for one host's read shard -> fragment + sidecar +
        sentinel (atomic renames). Deterministic: recomputing a shard on a
        DIFFERENT machine (dead-host salvage) yields byte-identical files,
        so even a concurrent late write by the presumed-dead host is
        harmless."""
        fragh = fragment_path(out_dir, out_file, host_id)
        # drop any stale sentinel/fragment/heartbeat BEFORE recomputing:
        # host 0 must never observe an old-fingerprint sentinel next to a
        # mid-rewrite fragment (silently-wrong-merge race on rerun into a
        # reused out_dir)
        for stale in (_sentinel(fragh), fragh, fragh + ".reads", _heartbeat(fragh)):
            try:
                os.remove(stale)
            except OSError:
                pass
        mine = shard_indices(len(reads), HostTopology(topo.num_hosts, host_id))
        local = [reads[i] for i in mine]
        logger.info(
            "host %d/%d: decomposing %d of %d reads",
            host_id, topo.num_hosts, len(local), len(reads),
        )
        with _HeartbeatThread(fragh):
            result = decompose_reads(local, monomers_dp, cfg, forward_fn=forward_fn)
            # write-then-rename so a crash mid-write never leaves a truncated
            # fragment that a later merge or --resume could mistake for complete
            write_raw_tsv(fragh + ".tmp", result, [m.name for m in monomers_dp])
            with open(fragh + ".reads.tmp", "w") as f:
                for r, (_, blocks) in zip(local, result):
                    f.write(f"{r.name.split()[0]}\t{len(blocks)}\n")
            os.replace(fragh + ".tmp", fragh)
            os.replace(fragh + ".reads.tmp", fragh + ".reads")
            with open(_sentinel(fragh) + ".tmp", "w") as f:
                f.write(fp + "\n")
            os.replace(_sentinel(fragh) + ".tmp", _sentinel(fragh))

    if not resumable:
        compute_shard(topo.host_id)
    else:
        logger.info("host %d: fragment exists, resuming past DP stage", topo.host_id)

    if topo.host_id != 0:
        return None

    # host 0: wait for every fragment; salvage shards of hosts that died
    # (missing sentinel + stale heartbeat) by recomputing them locally.
    # _wait_for returns the DEAD subset as soon as any host is declared
    # dead, even while other hosts are still computing — so after each
    # salvage we must re-enter the wait until EVERY sentinel matches;
    # merging earlier would open() fragments of still-live hosts that do
    # not exist yet (round-2 advisor finding). One shared deadline bounds
    # the whole loop.
    sentinels = [
        _sentinel(fragment_path(out_dir, out_file, h)) for h in range(topo.num_hosts)
    ]
    deadline = time.monotonic() + barrier_timeout
    while True:
        stalled = _wait_for(
            sentinels,
            fp,
            timeout=max(1.0, deadline - time.monotonic()),
            liveness_grace=liveness_grace,
            salvage=salvage_dead_hosts,
        )
        if not stalled:
            break
        dead = sorted(
            int(p.rsplit(".shard", 1)[1].split(".")[0]) for p in stalled
        )
        logger.warning(
            "host(s) %s appear dead (no heartbeat for %.0fs); host 0 is "
            "salvaging their shards locally", dead, liveness_grace,
        )
        for h in dead:
            compute_shard(h)
    raw_path = merge_raw_fragments(out_dir, out_file, topo, len(reads))
    logger.info("Saved merged raw decomposition to %s", raw_path)

    with open(raw_path) as f:
        per_read_raw = parse_raw_tsv(f.read())
    monomers_fin = add_rc_interleaved(load_fasta(monomers_path, upper=True))
    reads_by_name = {r.name: r.seq for r in load_fasta(sequences_path, upper=True)}
    finished = finish_reads(per_read_raw, reads_by_name, monomers_fin, second_best=second_best)
    final_path = os.path.join(out_dir, out_file + ".tsv")
    alt_path = os.path.join(out_dir, out_file + "_alt.tsv")
    write_final_tsv(final_path, alt_path, finished, identity_th=min_identity)
    logger.info("Transformation finished. Results can be found in %s", final_path)
    return final_path
