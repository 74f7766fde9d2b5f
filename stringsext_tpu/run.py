"""Orchestration: scan the stream with all missions, merge, print.

Parity reference: /root/reference/src/main.rs::run() (main.rs:93-175).

The reference runs one OS thread per mission in lock-step over 4 KiB
slices, with a merger thread k-merging each batch. Here the heavy
per-byte work happens up-front as data-parallel event generation (one
pass per *distinct encoding*, on TPU when available - mission
parallelism comes free since missions share event streams), and the
per-slice emission automaton + merge run on the host.
"""

from __future__ import annotations

import sys
from heapq import merge as heapq_merge
from typing import Dict, IO, List, Optional

from .engine.automaton import SliceScanner
from .engine.events import Events, generate_events
from .finding import Finding
from .input import LoadedStream, load_stream
from .mission import Missions
from .options import Args


def scan_stream(
    stream: LoadedStream,
    missions: Missions,
    event_backend: str = "numpy",
) -> "list[Finding]":
    """Scan the whole stream; returns findings in output order."""
    findings_batches = scan_stream_batches(stream, missions, event_backend)
    out: List[Finding] = []
    for batch in findings_batches:
        out.extend(batch)
    return out


def _generate_all_events(
    stream: LoadedStream, missions: Missions, event_backend: str
) -> Dict[str, Events]:
    """One decode pass per distinct encoding (shared by missions)."""
    events_by_encoding: Dict[str, Events] = {}
    for m in missions:
        if m.encoding_name not in events_by_encoding:
            if event_backend == "device":
                from .ops import device_events

                events_by_encoding[m.encoding_name] = device_events.generate_events_device(
                    stream.data, m.encoding_name
                )
            else:
                events_by_encoding[m.encoding_name] = generate_events(
                    stream.data, m.encoding_name
                )
    return events_by_encoding


def scan_stream_batches(
    stream: LoadedStream,
    missions: Missions,
    event_backend: str = "numpy",
):
    """Yield per-slice batches of merged findings (main.rs:118-136: the
    merger collects one FindingCollection per mission per slice and
    kmerges them)."""
    events_by_encoding = _generate_all_events(stream, missions, event_backend)
    scanners = [SliceScanner(m) for m in missions]

    for sl in stream.slices():
        per_mission: List[List[Finding]] = []
        for sc in scanners:
            ev = events_by_encoding[sc.mission.encoding_name]
            per_mission.append(
                sc.scan_slice(
                    sl.data, sl.stream_start, ev, sl.input_file_id, sl.is_last
                )
            )
        # k-way merge with the reference's comparison key
        # (finding.rs:92-109); per-mission lists are already sorted.
        yield list(heapq_merge(*per_mission, key=lambda f: f.sort_key()))


def run(args: Args, out: Optional[IO[bytes]] = None) -> int:
    """CLI entry: load input, scan, write the output stream.

    Output contract (main.rs:103-139): BOM first, then "\\n" before each
    finding line, then a final "\\n"; to stdout or `-p FILE`.
    """
    missions = Missions.from_args(args)
    stream = load_stream(args.inputs)

    close_out = False
    if out is None:
        if args.output is not None:
            out = open(args.output, "wb")
            close_out = True
        else:
            out = sys.stdout.buffer

    try:
        out.write(b"\xef\xbb\xbf")  # U+FEFF BOM (main.rs:116)
        for batch in scan_stream_batches(stream, missions):
            for f in batch:
                f.print(out, args)
        out.write(b"\n")
        out.flush()
    finally:
        if close_out:
            out.close()
    return 0
