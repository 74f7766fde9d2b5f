"""Concurrent 2-mission scan + merge ordering.

Scenario parity with /root/reference/src/main.rs:187-306 (test_merger):
deterministic tie-break by (position, mission_id, ubf, af).
"""

import numpy as np
from heapq import merge as heapq_merge

from stringsext_tpu.engine.automaton import SliceScanner
from stringsext_tpu.engine.events import generate_events
from stringsext_tpu.finding import PRECISION_AFTER, PRECISION_EXACT
from stringsext_tpu.mission import Missions


def test_merger():
    inp = "abcdefgÜhijklmn€opÜqrstuvwÜxyz".encode()

    ms = Missions.new(
        flag_counter_offset="5000",
        flag_encoding=["ascii", "utf-8"],
        flag_chars_min_nb="5",
        flag_same_unicode_block=True,
        flag_output_line_len="30",
    )

    data = np.frombuffer(inp, np.uint8)
    resv = []
    for m in ms:
        ev = generate_events(data, m.encoding_name)
        sc = SliceScanner(m)
        resv.append(sc.scan_slice(data, 0, ev, 0, True))

    assert [f.s for f in resv[0]] == [b"abcdefg", b"hijklmn", b"qrstuvw"]
    assert [f.s.decode() for f in resv[1]] == ["abcdefgÜhijklmn", "opÜqrstuvwÜxyz"]

    merged = list(heapq_merge(*resv, key=lambda f: f.sort_key()))
    got = [
        (f.s.decode(), f.position, f.position_precision, f.mission.mission_id)
        for f in merged
    ]
    assert got == [
        ("abcdefg", 5000, PRECISION_EXACT, 0),
        ("hijklmn", 5000, PRECISION_AFTER, 0),
        ("qrstuvw", 5000, PRECISION_AFTER, 0),
        ("abcdefgÜhijklmn", 5000, PRECISION_EXACT, 1),
        ("opÜqrstuvwÜxyz", 5000, PRECISION_AFTER, 1),
    ]
