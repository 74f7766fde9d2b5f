"""Calibrate the static scoped-VMEM grouping model on the attached chip.

The fused hot-only counts kernel's scoped-VMEM footprint grows with
the number of specs in a launch group and with their interval counts;
the v5e limit is 16 MB and round 3's reactive compile-fail-then-split
fallback cost the all-41 sweep ~2 GB/s. This probes COMPILE-ONLY
(no execution - the tunnel's first-execution latency does not apply)
synthetic groups of controlled (n_specs, total_intervals) at the
production tile (512 rows, hot_only) and prints the pass/fail matrix,
from which ops/pallas_swar.py's group_specs_by_vmem constants are set.

Usage: python scripts/calibrate_vmem.py [probe...]
  probe = N_SPECS:NIV_PER_SPEC  (default matrix below)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_spec(niv: int):
    if niv == 0:
        return ("sbyte", (), ())
    lo = 0x80
    step = max(1, 0x7E // max(niv, 1) // 2)
    ivs = []
    for k in range(niv):
        a = lo + 2 * k * step
        ivs.append((a, a + step - 1))
    return ("sbyte", tuple(ivs), ())


def main():
    import jax.numpy as jnp

    from stringsext_tpu.ops.pallas_swar import swar_counts

    probes = sys.argv[1:] or [
        "24:2", "28:2", "32:2", "40:2",
        "12:12", "16:12", "20:12", "24:12",
        "20:6", "24:6", "28:6", "32:6",
    ]
    w2 = jnp.zeros((512, 128), jnp.int32)
    for pr in probes:
        n, niv = (int(x) for x in pr.split(":"))
        # vary interval bounds per spec so specs stay distinct
        specs = tuple(
            ("sbyte",
             tuple((a + (i % 2), b - (i % 2)) for a, b in make_spec(niv)[1]),
             ())
            for i in range(n)
        )
        t0 = time.time()
        try:
            swar_counts.lower(
                w2, specs, tile_rows=512, interpret=False, hot_only=True
            ).compile()
            print(f"probe n={n:3d} niv={niv:3d} total_iv={n*niv:4d} "
                  f"OK   ({time.time()-t0:.1f}s)", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"probe n={n:3d} niv={niv:3d} total_iv={n*niv:4d} "
                  f"FAIL ({time.time()-t0:.1f}s) {msg}", flush=True)


if __name__ == "__main__":
    main()
