"""Measure device scan throughput per pipeline variant on the real TPU.

Tunnel-safe methodology (the axon tunnel adds seconds of jitter per
dispatch): iterate the computation on-device inside one jit with a
loop-dependent XOR (prevents hoisting), reduce to one scalar, and
difference a long run against a short run over several attempts.

Usage: python scripts/profile_device.py [size_mb] [iters]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    size = int(sys.argv[1]) * 1024 * 1024 if len(sys.argv) > 1 else 16 * 1024 * 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    import jax
    import jax.numpy as jnp

    from stringsext_tpu.mission import Missions
    from stringsext_tpu.ops import classify, pallas_scan
    from stringsext_tpu.ops.runs import extract_runs, extract_runs_packed, filter_words

    m = Missions.new(flag_encoding=["UTF-8"], flag_unicode_block_filter="Default")[0]
    af_w, ubf_w = filter_words(m)
    af_j, ubf_j = jnp.asarray(af_w), jnp.asarray(ubf_w)

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=size, dtype=np.uint8)
    rows = size // 128

    variants = {}

    def v_jnp_lanes(d, i):
        lanes = classify.utf8_lanes(d ^ (i % 2).astype(jnp.uint8), d.shape[0])
        return jnp.sum(lanes.length) + jnp.sum(lanes.cp)

    def v_jnp_full(d, i):
        lanes = classify.utf8_lanes(d ^ (i % 2).astype(jnp.uint8), d.shape[0])
        rt = extract_runs(lanes, af_j, ubf_j, jnp.int32(-1), capacity=1024)
        return rt.count.astype(jnp.int32) + jnp.sum(rt.start[:8])

    def v_pallas_lanes(d, i):
        d2 = (d ^ (i % 2).astype(jnp.uint8)).reshape(rows, 128)
        packed = pallas_scan.utf8_mission_lanes(d2, af_j, ubf_j, jnp.int32(-1),
                                                tile_rows=1024)
        return jnp.sum(packed[:8, :8])

    def v_pallas_full(d, i):
        d2 = (d ^ (i % 2).astype(jnp.uint8)).reshape(rows, 128)
        packed = pallas_scan.utf8_mission_lanes(d2, af_j, ubf_j, jnp.int32(-1),
                                                tile_rows=1024)
        rt = extract_runs_packed(packed, capacity=1024)
        return rt.count.astype(jnp.int32) + jnp.sum(rt.start[:8])

    from stringsext_tpu.ops import pallas_swar
    from stringsext_tpu.ops.runs import extract_runs_packed4

    ms3 = Missions.new(flag_encoding=["UTF-8", "utf-16le", "utf-16be"])
    swar_p = pallas_swar.swar_params(ms3.v)
    wrows = size // 4 // 128

    words0 = jax.device_put(
        jnp.asarray(raw[: wrows * 512].view(np.int32).reshape(wrows, 128))
    )

    def v_swar_lanes(_, i):
        w = jnp.bitwise_xor(words0, (i % 2) * 0x01010101)
        o8, ole, obe = pallas_swar.flagship_swar_lanes(
            w, tile_rows=256, **swar_p)
        return jnp.sum(o8[:4, :4]) + jnp.sum(ole[:4, :4]) + jnp.sum(obe[:4, :4])

    def v_swar_full(_, i):
        w = jnp.bitwise_xor(words0, (i % 2) * 0x01010101)
        outs = pallas_swar.flagship_swar_lanes(w, tile_rows=256, **swar_p)
        acc = jnp.int32(0)
        for ow in outs:
            rt = extract_runs_packed4(ow, capacity=1024)
            acc = acc + rt.count.astype(jnp.int32) + jnp.sum(rt.start[:8])
        return acc

    variants = {
        "jnp_lanes": v_jnp_lanes,
        "jnp_lanes+runs": v_jnp_full,
        "pallas_lanes": v_pallas_lanes,
        "pallas_lanes+runs": v_pallas_full,
        "swar3_lanes": v_swar_lanes,
        "swar3_lanes+runs": v_swar_full,
    }

    data = jax.device_put(jnp.asarray(raw))

    for name, fn in variants.items():
        @jax.jit
        def looped(d, k, fn=fn):
            def body(i, acc):
                return acc + fn(d, i).astype(jnp.int32)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        try:
            int(looped(data, 1))  # compile + warm
            t1 = min(
                _timeit(lambda: int(looped(data, 1))) for _ in range(4)
            )
            tk = min(
                _timeit(lambda: int(looped(data, iters))) for _ in range(3)
            )
            per = (tk - t1) / (iters - 1)
            print(
                f"{name:20s} t1={t1:7.3f}s t{iters}={tk:7.3f}s  "
                f"per-iter={per*1e3:8.2f} ms  {size/per/1e9:7.2f} GB/s"
            )
        except Exception as e:
            print(f"{name:20s} FAILED: {str(e).splitlines()[0][:120]}")


def _timeit(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
