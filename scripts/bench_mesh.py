"""Weak-scaling harness for the mesh-sharded scan.

Measures bytes/s of the sharded multi-mission scan at several data-axis
widths on whatever devices are available. On this 1-chip environment it
runs on the virtual CPU mesh (numbers are NOT TPU throughput - they
validate the harness and the scaling shape); on a pod slice the same
script measures real ICI scaling for BASELINE.md's >=85% efficiency
target.

Usage: python scripts/bench_mesh.py [shard_mb] [n_devices]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    shard_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4
    want_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    import jax

    if want_dev and len(jax.devices()) < want_dev:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={want_dev}"
        )
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from stringsext_tpu.mission import Missions
    from stringsext_tpu.parallel.mesh import build_sharded_scan, make_mesh

    ndev = len(jax.devices())
    missions = Missions.new(
        flag_encoding=["UTF-8", "utf-16le", "utf-16be", "ascii"]
    )
    shard_len = int(shard_mb * 1024 * 1024) // 2 * 2
    rng = np.random.default_rng(0)

    results = {}
    n_mission = 4 if ndev % 4 == 0 and ndev >= 4 else (2 if ndev % 2 == 0 else 1)
    max_data = ndev // n_mission
    n_data = 1
    while n_data <= max_data:
        mesh = make_mesh(n_data, n_mission)
        scan = build_sharded_scan(
            missions.v[:n_mission], mesh, shard_len=shard_len, capacity=4096
        )
        data = rng.integers(0, 256, size=n_data * shard_len, dtype=np.uint8)
        rt = scan(jnp.asarray(data))  # compile + warm
        jax.block_until_ready(rt)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(scan(jnp.asarray(data)))
            best = min(best, time.perf_counter() - t0)
        gbps = len(data) / best / 1e9
        results[n_data] = gbps
        eff = gbps / (results[1] * n_data) * 100 if 1 in results else 100.0
        print(
            f"data-shards={n_data:2d} (devices={n_data * n_mission:2d}): "
            f"{gbps:7.3f} GB/s  weak-scaling efficiency {eff:5.1f}%"
        )
        n_data *= 2


if __name__ == "__main__":
    main()
