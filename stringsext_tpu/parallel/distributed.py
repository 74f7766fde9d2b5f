"""Multi-host orchestration over DCN.

The reference is a single process (`std::sync::mpsc` + scoped threads,
main.rs:98,151); its distributed analog here (SURVEY.md section 5):

- `initialize()` wires `jax.distributed` so all hosts join one runtime;
  the global mesh then spans hosts, `lax.ppermute` halo exchange rides
  ICI within a slice and DCN across slices.
- Each host feeds its local byte-stream shards (`host_shard_range`),
  device scan produces run tables sharded over the "data" axis, and
  `gather_run_tables` all-gathers the (small) tables so host 0 can run
  the emission automaton and print globally ordered output - the
  distributed version of the reference's kmerge.

Multi-host execution needs an actual pod slice; single-host tests cover
the mesh semantics on the virtual CPU mesh (tests/test_parallel.py) and
the driver dry-runs the N-device compile (dryrun_multichip).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host JAX runtime (no-op when single-process or
    already initialized - the CLI may call this after a harness did).
    The already-joined probe must NOT touch jax.process_count(): that
    initializes the XLA backend, after which joining becomes
    impossible."""
    if num_processes is None or num_processes <= 1:
        return
    if jax.distributed.is_initialized():
        if jax.process_count() != num_processes:
            raise RuntimeError(
                f"jax.distributed already initialized with "
                f"{jax.process_count()} processes; cannot re-join as "
                f"{num_processes}"
            )
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard_range(total_bytes: int, shard_len: int) -> Tuple[int, int]:
    """Byte range this host feeds: contiguous run of data-shards."""
    nproc = jax.process_count()
    pid = jax.process_index()
    nshards = total_bytes // shard_len
    per = (nshards + nproc - 1) // nproc
    lo = min(pid * per, nshards)
    hi = min(lo + per, nshards)
    return lo * shard_len, hi * shard_len


def gather_run_tables(rt):
    """Bring the sharded run tables to every host (they are small:
    capacity-bounded per shard/mission). With jax.Array + a global mesh
    this is a device_get of the globally-sharded value; XLA inserts the
    cross-host transfers."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), rt)


# ---------------------------------------------------------------------------
# Multi-process end-to-end scan: shard the byte stream across processes
# at provably-quiescent boundaries, scan each shard exactly, gather the
# FINDINGS (not counts) to process 0, merge with the finding.rs:92-109
# key and print once - the distributed analog of the reference's whole
# observable behavior (main.rs:93-175).
# ---------------------------------------------------------------------------


_FINDING_COLS = (
    ("position", np.uint64), ("precision", np.int8),
    ("completes", np.uint8), ("file_id", np.int32),
    ("str_off", np.uint64), ("str_len", np.uint32),
)


def shard_boundaries(stream, missions, nprocs: int):
    """Deterministic slice-row shard boundaries for an nprocs-way
    distributed scan, or None when no exact split exists.

    A process may start scanning at row r iff EVERY mission's
    quiescence predicate holds there (previous slice cold + two
    windows long + kind no-span guard - `run._quiescent_mask`, the
    same predicate the in-process segment splitter uses, so
    exactness rests on the already-pinned segment argument,
    tests/test_segments.py). Every process computes the boundaries
    from the same bytes with the same pure function, so all agree
    without communication. Returns row bounds [0, q1, .., n_rows]
    (some shards may be empty when the data has no cold gap near the
    nominal split point - the left neighbor absorbs them)."""
    from ..encodings import encoding_kind
    from ..input import slice_table
    from ..run import _SEGMENT_KINDS, _host_hot_ranges, _quiescent_mask

    sl = slice_table(stream)
    n_rows = len(sl[0])
    if n_rows == 0 or nprocs <= 1:
        return [0, n_rows]
    jobs = list(enumerate(missions.v))
    for _i, m in jobs:
        if encoding_kind(m.encoding_name) not in _SEGMENT_KINDS:
            return None
    hot = _host_hot_ranges(stream, jobs)
    ok_all = np.ones(max(n_rows - 1, 0), bool)
    for i, m in jobs:
        if i not in hot:
            return None
        ok_all &= _quiescent_mask(
            sl, hot[i], 2 * m.output_line_char_nb_max,
            data=stream.data, kind=encoding_kind(m.encoding_name),
        )
    rows = np.flatnonzero(ok_all) + 1  # rows where a shard may start
    total = len(stream.data)
    starts = sl[0]
    bounds = [0]
    for k in range(1, nprocs):
        target = total * k // nprocs
        j = np.searchsorted(starts[rows], target) if len(rows) else 0
        q = int(rows[j]) if j < len(rows) else n_rows
        bounds.append(max(q, bounds[-1]))
    bounds.append(n_rows)
    return bounds


def scan_shard(stream, missions, r0: int, r1: int, hot_by_mission=None):
    """Exact scan of slice rows [r0, r1) with fresh (provably-true)
    mission states - the multi-process twin of run.py's segment job.
    Returns [(res_columns, strbuf_bytes)] per mission."""
    from concurrent.futures import ThreadPoolExecutor

    from .. import native
    from ..input import slice_table

    sl = slice_table(stream)
    out = []
    if r0 >= r1:
        empty = {
            name: np.zeros(0, dt) for name, dt in _FINDING_COLS
        }
        return [(dict(empty), b"") for _ in missions.v]

    def job(im):
        i, m = im
        ssl = tuple(a[r0:r1] for a in sl)
        seg_start = int(sl[0][r0])
        st = {
            "consumed": m.counter_offset + seg_start,
            "cursor": seg_start,
            "printed_maybe_cut": False,
            "dec_mode": 0,
            "dec_output_flag": False,
            "leftover_cps": [],
        }
        hot = (hot_by_mission or {}).get(i)
        if hot is not None:
            hs, he = hot
            seg_end = int(sl[0][r1 - 1] + sl[1][r1 - 1])
            ksel = (hs < seg_end) & (he > seg_start)
            hot = (hs[ksel], he[ksel])
        return native.native_scan(m, stream.data, *ssl, state=st,
                                  hot_ranges=hot)

    with ThreadPoolExecutor(max_workers=max(1, len(missions.v))) as ex:
        out = list(ex.map(job, enumerate(missions.v)))
    return out


def _serialize_findings(per_mission) -> bytes:
    import io

    payload = {}
    for i, (res, sb) in enumerate(per_mission):
        for name, dt in _FINDING_COLS:
            payload[f"m{i}_{name}"] = np.asarray(res[name], dt)
        payload[f"m{i}_strbuf"] = np.frombuffer(sb, np.uint8)
    buf = io.BytesIO()
    np.savez(buf, **payload)
    return buf.getvalue()


def _deserialize_findings(blob: bytes, n_missions: int):
    import io

    z = np.load(io.BytesIO(blob))
    out = []
    for i in range(n_missions):
        res = {
            name: z[f"m{i}_{name}"].astype(dt, copy=False)
            for name, dt in _FINDING_COLS
        }
        out.append((res, z[f"m{i}_strbuf"].tobytes()))
    return out


def gather_findings(per_mission, n_missions: int):
    """All-gather every process's serialized findings; returns the
    list of per-process payloads in process order (rank 0 uses it,
    other ranks get it too - allgather is the collective jax exposes
    for host-local data)."""
    from jax.experimental import multihost_utils

    blob = _serialize_findings(per_mission)
    size = np.array([len(blob)], np.int64)
    sizes = np.asarray(
        multihost_utils.process_allgather(size)
    ).reshape(-1)
    mx = int(sizes.max())
    padded = np.zeros(mx, np.uint8)
    padded[: len(blob)] = np.frombuffer(blob, np.uint8)
    all_payloads = np.asarray(multihost_utils.process_allgather(padded))
    all_payloads = all_payloads.reshape(jax.process_count(), mx)
    return [
        _deserialize_findings(
            all_payloads[p, : int(sizes[p])].tobytes(), n_missions
        )
        for p in range(jax.process_count())
    ]


def merge_gathered(missions, gathered):
    """Concatenate each mission's per-shard findings in shard (process)
    order - positions are absolute, so per-mission streams stay sorted
    - rebasing str_off into one strbuf per mission. Returns the
    `results` structure run._emit_lines consumes."""
    results = []
    for i, m in enumerate(missions.v):
        cols = {name: [] for name, _ in _FINDING_COLS}
        bufs = []
        off = 0
        for shard in gathered:
            res, sb = shard[i]
            for name, _dt in _FINDING_COLS:
                v = res[name]
                if name == "str_off":
                    v = v + np.uint64(off)
                cols[name].append(v)
            bufs.append(sb)
            off += len(sb)
        results.append((
            m,
            {k: np.concatenate(v) for k, v in cols.items()},
            b"".join(bufs),
        ))
    return results


def distributed_run(args, missions, out, engine: str = "auto") -> int:
    """Multi-process end-to-end scan: every process scans its
    quiescent shard of the (shared) input, findings are gathered, and
    process 0 prints the byte-identical merged stream (BOM + lines +
    trailing newline, main.rs:103-139). jax.distributed must already
    be initialized (see `initialize`)."""
    from ..input import load_stream
    from ..run import _emit_lines, _warn_once

    stream = load_stream(args.inputs)
    nproc = jax.process_count()
    pid = jax.process_index()
    bounds = shard_boundaries(stream, missions, nproc)
    if bounds is None:
        _warn_once(
            ("dist-fallback",),
            "Warning: no exact distributed split for this mission set "
            "(stateful/modal encoding or no device/host hot spec); "
            "process 0 scans everything.",
        )
        from ..input import slice_table

        n_rows = len(slice_table(stream)[0])
        bounds = [0] + [n_rows] * nproc
    hot_by_mission = None
    r0, r1 = bounds[pid], bounds[pid + 1]
    if engine == "tpu" and r1 > r0:
        # Device hot maps over THIS RANK'S shard only (each rank pays
        # one device pass for its bytes, the distributed analog of the
        # engine=tpu single-process path); range coordinates rebase to
        # stream offsets for scan_shard's clipping. Requires an even
        # shard base: the device kernels pair UTF-16 units by buffer
        # offset (docs/KERNELS.md invariant) - shard starts are slice
        # starts, which are odd only after odd-sized earlier files; in
        # that rare case this rank falls back to a full host scan.
        from ..input import LoadedStream, slice_table
        from ..ops.pallas_swar import cjk_hot_spec, swar_mission_spec
        from ..run import _device_hot_ranges_swar

        sl = slice_table(stream)
        seg_start = int(sl[0][r0])
        seg_end = int(sl[0][r1 - 1] + sl[1][r1 - 1])
        if seg_start % 2 == 0:
            sub = LoadedStream(
                stream.data[seg_start:seg_end],
                [(None, 0, seg_end - seg_start)],
            )
            swar_jobs = []
            for i, m in enumerate(missions.v):
                spec = swar_mission_spec(m) or cjk_hot_spec(m)
                if spec is not None:
                    swar_jobs.append((i, spec))
            if swar_jobs:
                hb = _device_hot_ranges_swar(sub, swar_jobs)
                hot_by_mission = {
                    i: (s + seg_start, e + seg_start)
                    for i, (s, e) in hb.items()
                }
    per_mission = scan_shard(stream, missions, r0, r1, hot_by_mission)
    gathered = gather_findings(per_mission, len(missions.v))
    if pid == 0:
        results = merge_gathered(missions, gathered)
        out.write(b"\xef\xbb\xbf")  # BOM (main.rs:116)
        _emit_lines(out, args, results)
        out.write(b"\n")
        out.flush()
    return 0
