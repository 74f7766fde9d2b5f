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


def _utf8_encode_cps(cps: np.ndarray):
    """Vectorized UTF-8 encoding of BMP codepoints (single-byte table
    values never exceed U+FFFF). Returns (payload_u8, co_int64) where
    co[k] is the payload offset of char k (len(cps)+1 entries)."""
    cps = cps.astype(np.int64)
    n1 = cps < 0x80
    n2 = (cps >= 0x80) & (cps < 0x800)
    n3 = cps >= 0x800
    lens = np.where(n1, 1, np.where(n2, 2, 3)).astype(np.int64)
    co = np.zeros(len(cps) + 1, np.int64)
    np.cumsum(lens, out=co[1:])
    out = np.empty(int(co[-1]), np.uint8)
    p = co[:-1]
    out[p[n1]] = cps[n1]
    out[p[n2]] = 0xC0 | (cps[n2] >> 6)
    out[p[n2] + 1] = 0x80 | (cps[n2] & 0x3F)
    out[p[n3]] = 0xE0 | (cps[n3] >> 12)
    out[p[n3] + 1] = 0x80 | ((cps[n3] >> 6) & 0x3F)
    out[p[n3] + 2] = 0x80 | (cps[n3] & 0x3F)
    return out, co


def _feed_from_acc(acc: np.ndarray, cp: np.ndarray):
    d = np.diff(acc.astype(np.int8), prepend=0, append=0)
    rs = np.flatnonzero(d == 1).astype(np.int64)
    re = np.flatnonzero(d == -1).astype(np.int64)
    if len(rs) == 0:
        return None
    pay, co = _utf8_encode_cps(cp[acc])
    run_len = re - rs
    co_base = np.zeros(len(rs), np.int64)
    if len(rs) > 1:
        np.cumsum(run_len[:-1], out=co_base[1:])
    return rs, re, co_base, co, pay


def runtable_feed(data: np.ndarray, mission, device: bool = True):
    """EXACT accepted-char run tables + decoded UTF-8 payload for a
    single-byte mission - the device run-table feed of KERNELS.md
    design 1 (the on-device analog of the reference's decode loop,
    finding_collection.rs:84-342), enabled by STRINGSEXT_RUNTABLE_FEED=1.

    The classification (per-byte codepoints + filter acceptance) runs
    on device; the run/payload compaction is a host numpy pass over the
    device lanes. `device=False` builds the identical arrays from the
    byte table with numpy alone (no jax import - used by the ASan fuzz,
    where jax-tracing paths are disabled; tests pin device==host).
    Returns (run_start, run_end, co_base, co, payload) for
    native_scan's `runtable_feed`, or None (no device kernel / no
    accepted run). Payload chars are globally consecutive across runs,
    so run r's char k sits at payload[co[co_base[r]+k] :
    co[co_base[r]+k+1]).
    """
    from ..encodings import encoding_kind

    if encoding_kind(mission.encoding_name) != KIND_SINGLE_BYTE:
        return None
    n = len(data)
    if not device:
        from ..encodings import full_byte_table

        tbl = np.asarray(full_byte_table(mission.encoding_name), np.int32)
        f = mission.filter
        ok = np.zeros(256, bool)
        for b in range(256):
            c = int(tbl[b])
            if c < 0:
                continue
            if c < 0x80:
                ok[b] = bool((f.af >> c) & 1)
            else:
                lead = 0xC0 | (c >> 6) if c < 0x800 else (
                    0xE0 | (c >> 12) if c < 0x10000 else 0xF0 | (c >> 18))
                ok[b] = bool((f.ubf >> (lead & 0x3F)) & 1)
        return _feed_from_acc(ok[data], tbl[data])

    from .runs import accept_mask, filter_words

    lanes = compute_lanes(data, mission.encoding_name)
    if lanes is None:
        return None
    import jax.numpy as jnp

    af_w, ubf_w = filter_words(mission)
    acc_dev = accept_mask(lanes, jnp.asarray(af_w), jnp.asarray(ubf_w))
    acc = np.asarray(acc_dev)[:n]
    cp = np.asarray(lanes.cp)[:n]
    return _feed_from_acc(acc, cp)


def generate_events_device(data: np.ndarray, encoding_name: str) -> Events:
    """Device-accelerated event generation (falls back to host numpy
    for encodings without a device kernel yet)."""
    if len(data) == 0:
        return generate_events(data, encoding_name)
    lanes = compute_lanes(data, encoding_name)
    if lanes is None:
        return generate_events(data, encoding_name)
    return lanes_to_events(lanes)
