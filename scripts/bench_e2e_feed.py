"""End-to-end CLI throughput: device run-table feed vs host engine.

Measures the FULL tool (CLI run() -> findings on a real fd), not the
kernel layer: engine=tpu with the default-on run-table feed against
engine=auto on the same corpus, in-process and warm (the tunnel's
per-process first-execution latency is excluded by a warm-up run; it
is an environment property, see docs/BENCHMARKS.md). Also measures
the host->device link bandwidth in the same session and reports the
LINK-BANDWIDTH CROSSOVER: the effective link speed above which the
device path beats the host path on this corpus, from

    t_tpu(BW) = t_tpu_measured - size/BW_measured + size/BW

(the only link-dependent term in the feed timeline is shipping the
corpus; the returned bitmask+chars are ~n/8 + 4*chars bytes and scale
the same way, folded into the conservative estimate).

Usage: python scripts/bench_e2e_feed.py [size_bytes] [corpus]
  corpus: "sparse" (default; 95% cold disk-image-like) or "dense"
Prints one JSON line per corpus.
"""

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

os.environ.setdefault("STRINGSEXT_DEVICE_PROBE", "0")  # engines set here


def sparse_corpus(size: int, seed: int = 7) -> bytes:
    """95% cold disk-image-like: zeros + noise stretches + plants."""
    rng = np.random.default_rng(seed)
    data = np.zeros(size, np.uint8)
    msgs = [
        b"/lib64/ld-linux-x86-64.so.2\x00",
        "Configuration déjà chargée €uro.".encode(),
        "Device path: \\EFI\\BOOT\\BOOTX64.EFI".encode("utf-16-le"),
        "Русский текст".encode("utf-16-le"),
    ]
    for off in range(4096, size - 4096, 65536):
        m = msgs[(off // 65536) % len(msgs)]
        data[off : off + len(m)] = np.frombuffer(m, np.uint8)
    # 5% noise stretches
    for off in range(0, size - 8192, size // 32):
        data[off : off + 2048] = rng.integers(0, 256, 2048, np.uint8)
    return data.tobytes()


def dense_corpus(size: int, seed: int = 8) -> bytes:
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, size, dtype=np.uint8)
    t = b"dense text segment with ASCII findings throughout 0123456789 "
    for off in range(0, size - len(t), 1024):
        data[off : off + len(t)] = np.frombuffer(t, np.uint8)
    return data.tobytes()


def measure_link_bw() -> float:
    """Effective H2D+compute+fetch bytes/s for an 8 MiB buffer (warm)."""
    import jax
    import jax.numpy as jnp

    buf = np.zeros(8 << 20, np.uint8)
    x = jax.device_put(buf)
    int(jnp.sum(x[::4096].astype(jnp.int32)))  # warm compile + link
    best = 1e18
    for _ in range(3):
        t0 = time.perf_counter()
        x = jax.device_put(buf)
        int(jnp.sum(x[::4096].astype(jnp.int32)))
        best = min(best, time.perf_counter() - t0)
    return len(buf) / best


def timed_run(argv, path, engine, reps=3):
    from stringsext_tpu.cli import parse_args
    from stringsext_tpu.run import run

    best = 1e18
    for _ in range(reps):
        with open(path, "wb") as f:
            t0 = time.perf_counter()
            rc = run(parse_args(argv), out=f, engine=engine)
            dt = time.perf_counter() - t0
        assert rc == 0
        best = min(best, dt)
    return best, os.path.getsize(path)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 8 << 20
    which = sys.argv[2] if len(sys.argv) > 2 else "sparse"
    corpora = {"sparse": sparse_corpus, "dense": dense_corpus}
    make = corpora[which]
    sizes = (size // 2, size)

    import jax

    backend = jax.default_backend()
    bw_link = measure_link_bw()

    t = {}  # (engine, size) -> best seconds
    for sz in sizes:
        blob = make(sz)
        src = tempfile.NamedTemporaryFile(suffix=".bin", delete=False)
        src.write(blob)
        src.close()
        out = tempfile.NamedTemporaryFile(suffix=".out", delete=False)
        out.close()
        argv = ["-t", "x", "-e", "UTF-8", "-e", "utf-16le",
                "-e", "utf-16be", src.name]
        try:
            for eng in ("auto", "tpu"):
                timed_run(argv, out.name, eng, reps=1)  # warm
                t[(eng, sz)], nb = timed_run(argv, out.name, eng)
            n_a = timed_run(argv, out.name, "auto", reps=1)[1]
            n_t = timed_run(argv, out.name, "tpu", reps=1)[1]
            assert n_a == n_t, "engines diverged in output size"
        finally:
            os.unlink(src.name)
            os.unlink(out.name)

    s0, s1 = sizes
    # Two-size linear fit t(size) = intercept + slope*size per engine:
    # the intercept is the fixed per-run cost (device dispatch round
    # trips over this link; Python setup), the slope the per-byte cost.
    fits = {}
    for eng in ("auto", "tpu"):
        slope = (t[(eng, s1)] - t[(eng, s0)]) / (s1 - s0)
        fits[eng] = (t[(eng, s0)] - slope * s0, slope)
    # Co-located projection: shipping the corpus is the only
    # link-bandwidth-dependent per-byte term, so the device path's
    # per-byte cost net of this link is slope_tpu - 1/bw_link; at a
    # co-located link of bandwidth B it becomes that + 1/B, and the
    # fixed dispatch intercept collapses with the latency (conservative
    # projection keeps it - so the reported crossover is an UPPER
    # bound on the link speed needed).
    net_dev_slope = fits["tpu"][1] - 1.0 / bw_link
    gain = fits["auto"][1] - net_dev_slope  # host per-byte cost margin
    crossover = (1.0 / gain) if gain > 0 else None
    rec = {
        "metric": f"e2e_feed_vs_host_{which}",
        "sizes_bytes": list(sizes),
        "backend": backend,
        "link_bw_bytes_s": round(bw_link),
        "t_auto_s": [round(t[("auto", s)], 4) for s in sizes],
        "t_tpu_feed_s": [round(t[("tpu", s)], 4) for s in sizes],
        "auto_mb_s": round(s1 / t[("auto", s1)] / 1e6, 1),
        "tpu_feed_mb_s": round(s1 / t[("tpu", s1)] / 1e6, 1),
        "fit_intercept_s": {e: round(fits[e][0], 4) for e in fits},
        "fit_per_mb_ms": {e: round(fits[e][1] * 1e6 * 1e3, 3)
                          for e in fits},
        "tpu_wins_at_measured_link": t[("tpu", s1)] < t[("auto", s1)],
        "device_per_mb_ms_net_of_link": round(net_dev_slope * 1e9, 3),
        "crossover_link_bytes_s": (round(crossover) if crossover
                                   else None),
        "note": ("crossover = link bandwidth above which the device "
                 "feed path's PER-BYTE cost beats the host engine's "
                 "on this corpus (fixed dispatch overhead excluded - "
                 "it collapses with co-located latency). CAVEAT: over "
                 "a tunneled link the per-transfer protocol overhead "
                 "scales with size and pollutes the slope, so None "
                 "here does NOT prove a co-located device loses; see "
                 "docs/BENCHMARKS.md 'Feed end-to-end + crossover' "
                 "for the host-share decomposition that gives the "
                 "honest co-located projection (the real crossover is "
                 "accepted-char DENSITY, not link bandwidth)"),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
