"""Tuning probe for the flagship SWAR counts kernel.

Measures the counts kernel alone, counts+extraction, and hot_only mode
across tile sizes on the real chip (tunnel-safe long/short differencing).

Usage: python scripts/tune_swar.py [size_mb] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    size = (int(sys.argv[1]) if len(sys.argv) > 1 else 32) * 1024 * 1024
    iters = max(int(sys.argv[2]) if len(sys.argv) > 2 else 60, 2)
    short = max(1, iters // 4)  # iters >= 2 keeps iters > short

    import jax
    import jax.numpy as jnp

    from stringsext_tpu.mission import Missions
    from stringsext_tpu.ops import pallas_swar
    from stringsext_tpu.ops.runs import extract_runs_swar_blocks

    ms3 = Missions.new(flag_encoding=["UTF-8", "utf-16le", "utf-16be"])
    p = pallas_swar.swar_params(ms3.v)
    specs = (
        ("utf8", p["af_iv"], p["ubf_iv"], p["greps"][0]),
        ("utf16", False, p["cp_iv_le"], p["greps"][1]),
        ("utf16", True, p["cp_iv_be"], p["greps"][2]),
    )

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=size, dtype=np.uint8)
    wrows = size // 4 // 128
    words0 = jax.device_put(
        jnp.asarray(raw[: wrows * 512].view(np.int32).reshape(wrows, 128))
    )

    def bench(fn, label):
        @jax.jit
        def looped(w, k):
            def body(i, acc):
                ww = jnp.bitwise_xor(w, (i % 2) * 0x01010101)
                return acc + fn(ww).astype(jnp.int64)
            return jax.lax.fori_loop(0, k, body, jnp.int64(0))

        try:
            int(looped(words0, 1))
            ts = min(timeit(lambda: int(looped(words0, short))) for _ in range(4))
            tl = min(timeit(lambda: int(looped(words0, iters))) for _ in range(4))
            per = (tl - ts) / (iters - short)
            print(f"{label:34s} per-iter={per*1e3:8.3f} ms  {size/per/1e9:7.2f} GB/s")
        except Exception as e:
            print(f"{label:34s} FAILED: {str(e).splitlines()[0][:110]}")

    for tr in (256, 512, 1024, 2048):
        def counts_only(ww, tr=tr):
            c = pallas_swar.swar_counts(ww, specs, tile_rows=tr)
            return jnp.sum(c[:, ::64].astype(jnp.int64))
        bench(counts_only, f"counts tile_rows={tr}")

    for tr in (512, 1024):
        def hot_only(ww, tr=tr):
            c = pallas_swar.swar_counts(ww, specs, tile_rows=tr, hot_only=True)
            return jnp.sum(c[:, ::64].astype(jnp.int64))
        bench(hot_only, f"hot_only tile_rows={tr}")

    eps = (
        dict(kind="utf8", af_iv=p["af_iv"], ubf_iv=p["ubf_iv"],
             grep=p["greps"][0]),
        dict(kind="utf16", cp_iv=p["cp_iv_le"], grep=p["greps"][1], be=False),
        dict(kind="utf16", cp_iv=p["cp_iv_be"], grep=p["greps"][2], be=True),
    )

    def full(ww):
        c = pallas_swar.swar_counts(ww, specs, tile_rows=512)
        acc = jnp.int64(0)
        for mi, ep in enumerate(eps):
            rt = extract_runs_swar_blocks(
                ww, c[2 * mi], c[2 * mi + 1], capacity=1024, **ep)
            acc = acc + rt.count.astype(jnp.int64) + jnp.sum(
                rt.start[:8].astype(jnp.int64))
        return acc
    bench(full, "counts+extract x3 (bench path)")


if __name__ == "__main__":
    main()
