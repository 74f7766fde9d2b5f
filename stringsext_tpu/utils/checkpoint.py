"""Checkpoint / resume for long scans.

The reference has no checkpointing; its closest feature is
`--counter-offset` (options.rs:78-80, mission.rs:388-394), i.e. manual
resume by byte offset when a huge input was split across runs. The TPU
build gets real resume by checkpointing each mission's carry state
(SURVEY.md section 5): `(consumed_bytes, decode cursor, leftover chars,
continuation flag)` - everything the emission automaton needs to
continue mid-stream with bit-identical output.

State format: JSON, one entry per mission keyed by mission_id, plus the
stream offset where scanning should resume.
"""

from __future__ import annotations

import json
from typing import List

from ..mission import Missions


def state_to_dict(mission_states: List[dict], next_slice: int) -> dict:
    return {
        "version": 1,
        "next_slice": next_slice,
        "missions": [
            {
                "consumed": int(st["consumed"]),
                "cursor": int(st.get("cursor", 0)),
                "printed_maybe_cut": bool(st.get("printed_maybe_cut", False)),
                "dec_mode": int(st.get("dec_mode", 0)),
                "dec_output_flag": bool(st.get("dec_output_flag", False)),
                "leftover_cps": list(map(int, st.get("leftover_cps", []))),
            }
            for st in mission_states
        ],
    }


def save_checkpoint(path: str, mission_states: List[dict], next_slice: int) -> None:
    """Atomic write (temp + rename): a crash mid-dump must never
    destroy the previous good checkpoint - surviving crashes is the
    whole point of checkpointing."""
    import os

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(state_to_dict(mission_states, next_slice), f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_checkpoint(path: str, expected_missions: int | None = None) -> dict:
    with open(path) as f:
        d = json.load(f)
    if d.get("version") != 1:
        raise ValueError(f"unsupported checkpoint version in {path}")
    if expected_missions is not None and len(d.get("missions", [])) != expected_missions:
        raise ValueError(
            f"checkpoint {path} holds {len(d.get('missions', []))} mission "
            f"states but the current scan has {expected_missions} - resume "
            "must use the same -e mission set"
        )
    return d


def fresh_states(missions: Missions) -> List[dict]:
    return [
        {
            "consumed": m.counter_offset,
            "cursor": 0,
            "printed_maybe_cut": False,
            "dec_mode": 0,
            "dec_output_flag": False,
            "leftover_cps": [],
        }
        for m in missions
    ]
