"""Exact decode-event generation using the device classification lanes.

Bridges the TPU kernels (ops/classify.py) to the host emission
automaton: lanes are computed on device, transferred, and compacted to
the same `Events` struct the numpy generators produce. CJK encodings
fall back to the host generators (their boundary chains need the
pointer-jump pass, kept on host this round).
"""

from __future__ import annotations

import numpy as np

from ..encodings import (
    KIND_SINGLE_BYTE,
    KIND_UTF16BE,
    KIND_UTF16LE,
    KIND_UTF8,
    encoding_kind,
)
from ..engine.events import Events, generate_events
from . import classify


def lanes_to_events(lanes, base: int = 0) -> Events:
    """Compact per-byte lanes into an event list (host side)."""
    start = np.asarray(lanes.start)
    pending = np.asarray(lanes.pending)
    starts = np.flatnonzero(start & ~pending)
    length = np.asarray(lanes.length)[starts]
    cp = np.asarray(lanes.cp)[starts]
    report_off = np.asarray(lanes.report_off)[starts]
    pushback = np.asarray(lanes.pushback)[starts]
    pos = starts.astype(np.int64) + base
    return Events(pos, length.astype(np.int32), cp.astype(np.int32),
                  pos + report_off, pushback.astype(np.int32))


def _bucket(n: int, minimum: int = 1024) -> int:
    """Pad target: next power of two (one jit compile per bucket)."""
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


def compute_lanes(data: np.ndarray, encoding_name: str):
    """Run the device classification kernel for one chunk, padding to a
    power-of-two bucket so each (kind, bucket) compiles once. Returns
    lanes whose arrays are bucket-sized; positions >= len(data) are
    inert. Returns None for encodings without a device kernel."""
    import jax.numpy as jnp

    kind = encoding_kind(encoding_name)
    n = len(data)
    cap = _bucket(n)
    padded = np.zeros(cap, dtype=np.uint8)
    padded[:n] = data
    b = jnp.asarray(padded)
    if kind == KIND_UTF8:
        return classify.utf8_lanes(b, n)
    if kind in (KIND_UTF16LE, KIND_UTF16BE):
        return classify.utf16_lanes(b, kind == KIND_UTF16BE, n)
    if kind == KIND_SINGLE_BYTE:
        return classify.single_byte_lanes(b, encoding_name, n)
    return None


def generate_events_device(data: np.ndarray, encoding_name: str) -> Events:
    """Device-accelerated event generation (falls back to host numpy
    for encodings without a device kernel yet)."""
    if len(data) == 0:
        return generate_events(data, encoding_name)
    lanes = compute_lanes(data, encoding_name)
    if lanes is None:
        return generate_events(data, encoding_name)
    return lanes_to_events(lanes)
