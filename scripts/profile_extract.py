"""Quantify the run-table extraction overhead on the flagship pipeline.

Times, at the bench buffer size on the real chip:
  counts     - the fused 3-mission SWAR counts kernel alone
  extract1   - counts + 1 mission's run-table extraction
  full       - counts + all 3 extractions (= bench.py headline)

Tunnel-safe long-vs-short differencing as in bench.py.

Usage: python scripts/profile_extract.py [size_mb] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    size = (int(sys.argv[1]) if len(sys.argv) > 1 else 64) * 1024 * 1024
    iters = max(int(sys.argv[2]) if len(sys.argv) > 2 else 100, 2)
    iters_short = max(1, iters // 4)  # iters >= 2 keeps the divisor > 0

    import jax
    import jax.numpy as jnp

    from bench import make_corpus
    from stringsext_tpu.ops import pallas_swar
    from stringsext_tpu.ops.runs import extract_runs_swar_blocks
    import __graft_entry__ as g

    missions = g._flagship_missions()
    swar_p = pallas_swar.swar_params(missions.v)
    eps = (
        dict(kind="utf8", af_iv=swar_p["af_iv"], ubf_iv=swar_p["ubf_iv"],
             grep=swar_p["greps"][0]),
        dict(kind="utf16", cp_iv=swar_p["cp_iv_le"], grep=swar_p["greps"][1],
             be=False),
        dict(kind="utf16", cp_iv=swar_p["cp_iv_be"], grep=swar_p["greps"][2],
             be=True),
    )

    rows = size // 512
    data = jax.device_put(
        jnp.asarray(make_corpus(size).view(np.int32)).reshape(rows, 128)
    )

    def mk(n_extract):
        def step(w2d, xw):
            counts = pallas_swar.flagship_swar_counts(
                w2d, tile_rows=512, xor_word=xw, **swar_p
            )
            chk = jnp.sum(counts[:, :8].astype(jnp.int64))
            for mi in range(n_extract):
                rt = extract_runs_swar_blocks(
                    w2d.reshape(-1), counts[2 * mi], counts[2 * mi + 1],
                    capacity=1024, xor_word=xw, **eps[mi]
                )
                chk = chk + rt.count + jnp.sum(rt.start[:8].astype(jnp.int64))
            return chk

        def bench(w2d, k):
            def body(i, acc):
                xw = (i % 2) * 0x01010101
                return acc + step(w2d, xw)
            return jax.lax.fori_loop(0, k, body, jnp.int64(0))

        return jax.jit(bench)

    for name, ne in (("counts", 0), ("extract1", 1), ("full", 3)):
        fn = mk(ne)
        int(fn(data, 1))
        int(fn(data, iters_short))
        int(fn(data, iters))

        def timed(k):
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                int(fn(data, k))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (timed(iters) - timed(iters_short)) / (iters - iters_short)
        print(f"{name:9s} {size / dt / 1e9:7.2f} GB/s  ({dt * 1e3:.3f} ms/iter)")


if __name__ == "__main__":
    main()
