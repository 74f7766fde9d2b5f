"""Benchmark: device scan throughput on the flagship configuration.

Measures the BASELINE.md headline metric: bytes/s of the multi-mission
scan (UTF-8 + UTF-16LE + UTF-16BE, the conformance-corpus config) over
a device-resident buffer on one chip. The scan step is the full device
pipeline: per-byte classification lanes for all three encodings +
filter masks + accepted-run compaction to run tables (the sparse
summary the host emitter consumes).

Timing is tunnel-safe: the scan is iterated *on device* inside one jit
(each iteration XORs the buffer with a loop-dependent byte so no work
can be hoisted or cached), reduced to one scalar checksum, and the
fixed dispatch/fetch latency is cancelled by differencing a long run
against a short run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver target of 10 GB/s/chip
(BASELINE.json; the reference publishes no numbers - SURVEY.md sec. 6).
"""

import json
import sys
import time

import numpy as np


def make_corpus(size: int, seed: int = 0) -> np.ndarray:
    """Binary-image-like corpus: mostly random bytes with embedded
    ASCII/UTF-8/UTF-16 strings (like the reference's functional test
    input2: machine code + embedded UTF-16LE strings)."""
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, size=size, dtype=np.uint8)
    msgs = [
        b"/lib64/ld-linux-x86-64.so.2\x00",
        "Configuration déjà chargée €uro.".encode("utf-8"),
        "Device path: \\EFI\\BOOT\\BOOTX64.EFI".encode("utf-16-le"),
        "Русский текст в дампе памяти".encode("utf-16-le"),
        b"GET /index.html HTTP/1.1\r\nHost: example.com\r\n",
    ]
    step = max(size // 2048, 4096)
    for off in range(0, size - 256, step):
        m = msgs[(off // step) % len(msgs)]
        data[off : off + len(m)] = np.frombuffer(m, np.uint8)
    return data


def build_bench_fn(use_pallas=None):
    import jax
    import jax.numpy as jnp

    import importlib.util

    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    g = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(g)
    scan_step, _ = g.entry(use_pallas=use_pallas)

    def bench_fn(data, iters):
        def body(i, acc):
            # Loop-dependent XOR word: applied INSIDE the scan step
            # (in-kernel for the SWAR path, fused elementwise for the
            # jnp path) so every iteration's input is distinct - XLA
            # cannot hoist the scan out of the loop - without a
            # materialized full-size XOR pass feeding the kernel.
            xw = (i % 2) * 0x01010101
            out = scan_step(data, xor_word=xw)
            chk = acc
            for rt in out:
                chk = chk + rt[3].astype(jnp.int64)  # run count
                chk = chk + jnp.sum(rt[0][:8].astype(jnp.int64))
            return chk

        return jax.lax.fori_loop(0, iters, body, jnp.int64(0))

    return jax.jit(bench_fn, static_argnames=())


def main():
    # 64 MiB resident amortizes the per-pass fixed costs ~4% better
    # than 32 MiB; 100 iterations keep total runtime similar.
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 64 * 1024 * 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    iters_short = max(1, iters // 4)

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    bench = build_bench_fn()
    # Resident as packed int32 words (the kernels' native layout).
    data = jax.device_put(jnp.asarray(make_corpus(size).view(np.int32)))

    # Warmup / compile both iteration counts. If the Pallas path fails
    # to compile in this environment, fall back to the jnp kernels
    # (slower, but the benchmark still reports).
    try:
        int(bench(data, 1))
    except Exception as e:
        print(f"pallas path failed ({type(e).__name__}); jnp fallback",
              file=sys.stderr)
        bench = build_bench_fn(use_pallas=False)
        data = jax.device_put(jnp.asarray(make_corpus(size)))  # uint8 path
        int(bench(data, 1))
    int(bench(data, iters_short))
    int(bench(data, iters))

    def timed(k):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            int(bench(data, k))  # scalar fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    # Difference two LONG runs: the per-dispatch tunnel latency varies
    # by milliseconds, so differencing against a 1-iteration run puts
    # that jitter on a (iters-1) divisor; a quarter-length run keeps
    # the same fixed-cost cancellation with the noise amortized over
    # 3/4 of the iterations.
    t_short = timed(iters_short)
    t_long = timed(iters)
    dt_per_iter = (t_long - t_short) / (iters - iters_short)
    gbps = size / dt_per_iter / 1e9
    print(
        json.dumps(
            {
                "metric": "scan_throughput_3mission",
                "value": round(gbps, 3),
                "unit": "GB/s",
                "vs_baseline": round(gbps / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
