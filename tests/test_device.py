"""Device kernels must be bit-exact with the host numpy generators.

Random byte fuzz + structured corpora, per encoding kind; plus run-table
consistency against a reference run computation.
"""

import numpy as np
import pytest

from stringsext_tpu.engine.events import generate_events
from stringsext_tpu.mission import AF_ALL, UBF_ALL, UBF_INVALID, Utf8Filter
from stringsext_tpu.ops import runs as runs_mod
from stringsext_tpu.ops.device_events import generate_events_device

rng = np.random.default_rng(42)


def corpora():
    out = [
        b"",
        b"plain ascii text with some numbers 12345",
        "Héllo 世界 \U0001F600 mixed".encode("utf-8"),
        b"\xff\xfe\xc3\x28\xe2\x82\xc0\xc1\xf5abc\xe2\x82",
        "surrogate stress ퟿".encode("utf-8", "surrogatepass"),
    ]
    # Sizes stay within the 1024/2048 pad buckets: the CPU backend's
    # scatter compile time grows steeply with shape, and every bucket is
    # a fresh XLA compile. Real-chunk shapes are exercised by bench.py.
    for size in (1, 2, 3, 7, 64, 1000, 2047):
        out.append(rng.integers(0, 256, size=size, dtype=np.uint8).tobytes())
    # mostly-ascii with noise
    base = bytearray(b"the quick brown fox jumps over the lazy dog " * 20)
    for i in rng.integers(0, len(base), 40):
        base[i] = int(rng.integers(128, 256))
    out.append(bytes(base))
    # utf-16 shaped data incl. surrogates
    units = rng.integers(0, 0x10000, size=500, dtype=np.uint16)
    out.append(units.tobytes())
    return out


def _assert_events_equal(a, b, ctx):
    assert len(a) == len(b), f"{ctx}: count {len(a)} != {len(b)}"
    for field in ("pos", "in_len", "cp", "report", "pushback"):
        np.testing.assert_array_equal(
            getattr(a, field), getattr(b, field), err_msg=f"{ctx}: {field}"
        )


@pytest.mark.parametrize("enc", ["UTF-8", "UTF-16LE", "UTF-16BE", "windows-1252",
                                 "KOI8-R", "x-user-defined", "IBM866"])
def test_device_events_match_host(enc):
    for i, blob in enumerate(corpora()):
        data = np.frombuffer(blob, np.uint8)
        host = generate_events(data, enc)
        dev = generate_events_device(data, enc)
        _assert_events_equal(host, dev, f"{enc} corpus#{i}")


def _reference_runs(data, enc, filt):
    """Run table computed from host events (reference for extract_runs)."""
    from stringsext_tpu.engine.automaton import utf8_lead

    ev = generate_events(data, enc)
    runs = []
    cur = None
    for i in range(len(ev)):
        cp = int(ev.cp[i])
        pos = int(ev.pos[i])
        ln = int(ev.in_len[i])
        ok = cp >= 0 and (
            filt.pass_af_filter(cp) if cp < 0x80 else filt.pass_ubf_filter(utf8_lead(cp))
        )
        if ok and cur is not None and cur[1] == pos:
            cur[1] = pos + ln
            cur[2] += 1
            cur[3] += int(cp == 63)
        elif ok:
            if cur:
                runs.append(tuple(cur))
            cur = [pos, pos + ln, 1, int(cp == 63)]
        else:
            if cur:
                runs.append(tuple(cur))
            cur = None
    if cur:
        runs.append(tuple(cur))
    return runs


@pytest.mark.parametrize("enc", ["UTF-8", "windows-1251"])
def test_extract_runs_matches_reference(enc):
    import jax.numpy as jnp

    from stringsext_tpu.ops import classify

    filt = Utf8Filter(af=AF_ALL, ubf=UBF_ALL & ~UBF_INVALID, grep_char=63)

    class M:  # minimal mission-like for filter_words
        filter = filt

    from stringsext_tpu.ops.device_events import compute_lanes

    af_w, ubf_w = runs_mod.filter_words(M)
    for i, blob in enumerate(corpora()):
        if len(blob) == 0:
            continue
        data = np.frombuffer(blob, np.uint8)
        lanes = compute_lanes(data, enc)
        rt = runs_mod.extract_runs(
            lanes, jnp.asarray(af_w), jnp.asarray(ubf_w), jnp.int32(63)
        )
        count = int(rt.count)
        s, e, ch, gh = (np.asarray(x) for x in (rt.start, rt.end, rt.chars, rt.grep_hits))
        got = [(int(s[k]), int(e[k]), int(ch[k]), int(gh[k])) for k in range(count)]
        want = _reference_runs(data, enc, filt)
        assert got == want, f"{enc} corpus#{i}\n got={got[:10]}\nwant={want[:10]}"


def test_iso2022_lanes_match_host():
    """Modal ISO-2022-JP device lanes (mode prefix scan + orbit,
    ops/classify_iso2022.py) == the host generator
    (engine/events_iso2022.generate), event for event: directed escape
    shapes (valid/invalid/truncated/redundant, dangling leads, parity
    shifts) + escape-planted random fuzz."""
    import jax.numpy as jnp

    from stringsext_tpu.ops.classify_iso2022 import iso2022_lanes

    r = np.random.default_rng(0)

    def device_events(data):
        n = len(data)
        cap = 8
        while cap < n:
            cap *= 2
        padded = np.zeros(cap, np.uint8)
        padded[:n] = data
        lanes, _hot = iso2022_lanes(jnp.asarray(padded), n)
        start = np.asarray(lanes.start)[:n]
        pend = np.asarray(lanes.pending)[:n]
        pos = np.flatnonzero(start & ~pend)
        rep = pos + np.asarray(lanes.report_off)[:n][pos]
        # raw per-event reports; the host generator applies the
        # emission-clock running max (events_iso2022.generate's
        # maximum.accumulate) - mirror it
        rep = np.maximum.accumulate(rep) if len(rep) else rep
        return (pos, np.asarray(lanes.length)[:n][pos],
                np.asarray(lanes.cp)[:n][pos], rep,
                np.asarray(lanes.pushback)[:n][pos])

    def check(blob, tag):
        data = np.frombuffer(bytes(blob), np.uint8)
        ev = generate_events(data, "ISO-2022-JP")
        order = np.argsort(ev.pos, kind="stable")
        host = (ev.pos[order], ev.in_len[order], ev.cp[order],
                ev.report[order], ev.pushback[order])
        dev = device_events(data)
        for name, a, b in zip(("pos", "len", "cp", "rep", "pb"),
                              host, dev):
            np.testing.assert_array_equal(
                np.asarray(a, np.int64), np.asarray(b, np.int64),
                err_msg=f"{tag}: {name}")

    check(b"hello world", "ascii")
    check("こんにちは世界 test".encode("iso2022_jp"), "jis-roundtrip")
    check(b"\x1b(Iabc\x31\x5f\x1b(Bback", "katakana")
    check(b"\x1b(Jback\\slash~tilde", "roman")
    check(b"ab\x1bXcd", "inv-near")
    check(b"ab\x1b(Xcd", "inv-far")
    check(b"a\x1b(B\x1b(Bb", "redundant")
    check(b"a\x1b(B\x1bX\x1b(Bb", "red-with-inv")
    check(b"abc\x1b", "trunc1")
    check(b"abc\x1b(", "trunc2")
    check(b"abc\x1b$", "trunc3")
    check(b"\x1b$B\x24\x1b(Bx", "dangle")
    check(b"\x1b$B\x24\x22\x10\x24\x22\x81\x24\x22\x1b(Bz", "lead-bad")
    check(b"\x1b$B\x24", "pend-lead")
    check(b"\x1b$B\x24\x22\x24", "pend-lead2")
    check(b"a\x1b\x1b(Bb", "esc-esc")
    check(b"a\x1b$\x1b(Bb", "esc-dollar-esc")
    check(b"a\x0e\x0fb", "so-si")
    frags = [b"\x1b", b"\x1b(", b"\x1b(B", b"\x1b(I", b"\x1b(J",
             b"\x1b$B", b"\x1b$@", b"\x1b$X"]
    for t in range(40):
        nn = int(r.integers(1, 400))
        d = r.integers(0, 256, nn, np.uint8)
        for _ in range(int(r.integers(0, 8))):
            p = int(r.integers(0, nn))
            f = frags[int(r.integers(0, len(frags)))]
            d[p:p + len(f)] = np.frombuffer(f, np.uint8)[
                :max(0, min(len(f), nn - p))]
        check(d.tobytes(), f"fuzz{t}")


def test_blocked_orbit_equals_sequential_chain():
    """_orbit_mask_blocked (the gather-free blocked resolve, round 5)
    must equal the sequential chain for random step fields, claim-rest
    tails, traced-ish starts and non-block-aligned caps/ends."""
    import numpy as np
    import jax.numpy as jnp

    import stringsext_tpu.ops.classify_cjk as C

    def orbit_ref(step, n, start=0):
        cap = len(step)
        out = np.zeros(cap, bool)
        p = int(start)
        while p < min(n, cap):
            out[p] = True
            p += max(int(step[p]), 1)
        return out

    rng = np.random.default_rng(41)
    for trial in range(40):
        cap = int(rng.choice([2048, 4096, 5120, 8192, 12288]))
        step = rng.integers(1, 5, cap).astype(np.int32)
        n = int(rng.integers(cap // 2, cap + 1))
        for _ in range(3):  # claim-rest steps near the end
            i = int(rng.integers(max(n - 8, 0), n))
            step[i] = max(n - i, 1)
        start = int(rng.choice([0, 1, 3, 4, 5, 7, 515, 600]))
        got = np.asarray(C._orbit_mask_blocked(
            jnp.asarray(step), jnp.int32(n), start))
        want = orbit_ref(step, n, start)
        assert (got == want).all(), (trial, cap, n, start)


def test_multi_start_blocked_orbit_equals_scalar():
    """_orbit_masks_block0 (mesh stage C's shared resolve) must equal
    the scalar blocked resolve for every start, incl. sub-block caps."""
    import numpy as np
    import jax.numpy as jnp

    import stringsext_tpu.ops.classify_cjk as C

    rng = np.random.default_rng(43)
    for trial in range(20):
        cap = int(rng.choice([300, 700, 2048, 5120]))
        step = rng.integers(1, 5, cap).astype(np.int32)
        n = int(rng.integers(cap // 2, cap + 1))
        for _ in range(2):
            i = int(rng.integers(max(n - 8, 0), n))
            step[i] = max(n - i, 1)
        starts = np.array([0, 4, 5, 7], np.int32)
        multi = np.asarray(C._orbit_masks_block0(
            jnp.asarray(step), n, jnp.asarray(starts)))
        for si, st in enumerate(starts):
            ref = np.asarray(C._orbit_mask_blocked(
                jnp.asarray(step), jnp.int32(n), int(st)))
            assert (multi[si] == ref).all(), (trial, cap, n, int(st))
