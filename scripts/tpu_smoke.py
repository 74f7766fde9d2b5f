#!/usr/bin/env python3
"""Real-chip engine=tpu smoke: one command, scripted assertions.

All unit tests force the CPU backend (tests/conftest.py), so a Mosaic
or device-tunnel regression in the engine=tpu path would only surface
when someone manually follows the verify recipe. This script closes
that gap (VERDICT r2 item 7; broadened to 3 configs per r3 item 9):

1. golden config 1 (the reference conformance corpus,
   /root/reference/tests/functional/run-tests:10-16): engine=auto and
   engine=tpu in subprocesses on the attached accelerator, stdout
   byte-identical to the checked-in expected_output1; engine=tpu runs
   a SECOND fresh process with compile logging and asserts the
   persistent XLA compilation cache served every expensive kernel;
2. a UTF-16 + CJK hot-map config (utf-16le + Shift_JIS + gb18030 on a
   deterministic sparse corpus with planted strings and cold gaps):
   engine=tpu byte-identical to engine=auto - covers the UTF-16 parity
   kernels and the CJK plausible-byte hot maps + align_cursor resume;
3. a run-table-feed config (STRINGSEXT_RUNTABLE_FEED=1, KOI8-R +
   UTF-8 + modal ISO-2022-JP over a text-dense corpus with planted
   JIS blocks and cold-region escapes): engine=tpu byte-identical to
   engine=auto - covers the device exact-run extraction + payload
   feed lanes (incl. the mode-prefix-scan ISO path) on real hardware.

Budget: each engine=tpu process pays the device's first-execution
latency once (on the session's tunneled v5e that alone measured
130-300 s; on a co-located TPU it is the Mosaic compile, ~20-40 s cold
and ~0 s warm). Allow ~20 min end to end over a tunnel. Exit 0 = all
green, one JSON line.

Usage: python scripts/tpu_smoke.py [corpus_dir]
       make tpu-smoke
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/functional"


def run_cli(argv, engine: str, log_compiles: bool = False, extra_env=None):
    env = dict(os.environ)
    env["STRINGSEXT_ENGINE"] = engine
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "stringsext-tpu",
                     "jax-cache"),
    )
    if log_compiles:
        env["JAX_LOG_COMPILES"] = "1"
    if extra_env:
        env.update(extra_env)
    t0 = time.perf_counter()
    p = subprocess.run(
        [sys.executable, "-m", "stringsext_tpu.cli", *argv],
        capture_output=True, cwd=REPO, env=env, timeout=1200,
    )
    dt = time.perf_counter() - t0
    if p.returncode != 0:
        sys.stderr.write(p.stderr.decode(errors="replace")[-4000:])
        raise SystemExit(f"engine={engine} CLI failed rc={p.returncode}")
    return p.stdout, p.stderr.decode(errors="replace"), dt


def make_corpora(tmp):
    """Deterministic smoke corpora (small: the tunnel dominates)."""
    import numpy as np

    rng = np.random.default_rng(9)
    # config 2: sparse with planted UTF-16 + CJK strings and cold gaps
    n = 256 * 1024
    blob = bytearray(n)
    msgs = [
        "wide строка для теста".encode("utf-16-le"),
        "シフトジスの文字列".encode("shift_jis"),
        "汉字字符串测试".encode("gb18030"),
        b"plain ascii anchor string",
    ]
    k = 0
    for off in range(700, n - 128, 2900):
        if (off % (64 * 1024)) > 40 * 1024:
            continue  # cold gaps: the hot-map skipper must engage
        m = msgs[k % len(msgs)]
        blob[off:off + len(m)] = m
        k += 1
    noise = rng.integers(0, 256, 2048, np.uint8).tobytes()
    blob[n // 2:n // 2 + len(noise)] = noise
    p2 = os.path.join(tmp, "cjk_utf16.bin")
    open(p2, "wb").write(bytes(blob))

    # config 3: text-dense KOI8-R + ASCII (long accepted runs: the
    # run-table feed's full-window lane must engage) + planted modal
    # ISO-2022-JP blocks with cold-region escapes (the round-4
    # mode-prefix-scan feed path, ops/classify_iso2022.py)
    text = ("в лесу родилась ёлочка, в лесу она росла " * 40).encode("koi8_r")
    jis = "こんにちは世界。国際化テストです。".encode("iso2022_jp")
    blob3 = bytearray(rng.integers(0, 256, n, np.uint8).tobytes())
    for off in range(2048, n - len(text) - 64, 24576):
        blob3[off:off + len(text)] = text
    jblk = b"\x1b$B" + jis[3:-3] * 12 + b"\x1b(B"
    for off in range(14000, n - len(jblk) - 64, 49152):
        blob3[off:off + len(jblk)] = jblk
    for off in range(9000, n - 16, 31111):
        blob3[off:off + 3] = b"\x1b$B"  # cold-region mode switch
    p3 = os.path.join(tmp, "feed.bin")
    open(p3, "wb").write(bytes(blob3))
    return p2, p3


def main():
    if not os.path.exists(os.path.join(CORPUS, "input1")):
        print(json.dumps({"tpu_smoke": "skip", "reason": "no corpus"}))
        return 0
    expected = open(os.path.join(CORPUS, "expected_output1"), "rb").read()
    argv1 = ["-q", "16", "-g", "63", "-tx", "-a", "All-Ctrl", "-u",
             "Common", "-e", "UTF-8", "-e", "utf-16le", "-e", "utf-16be",
             "--", os.path.join(CORPUS, "input1")]

    out_auto, _, t_auto = run_cli(argv1, "auto")
    assert out_auto == expected, "engine=auto diverges from golden 1"

    out_tpu, _, t_tpu1 = run_cli(argv1, "tpu")
    assert out_tpu == expected, "engine=tpu diverges from golden 1"

    # Second fresh process: the persistent compilation cache must serve
    # every kernel (no recompilation across CLI invocations).
    out_tpu2, err2, t_tpu2 = run_cli(argv1, "tpu", log_compiles=True)
    assert out_tpu2 == expected, "engine=tpu (2nd process) diverges"
    compiles = err2.count("Finished XLA compilation")
    cache_hits = err2.lower().count("cache hit")
    # The persistent cache only stores entries whose compile took >=
    # jax_persistent_cache_min_compile_time_secs (the CLI sets 0.2 s),
    # so tiny wrapper kernels legitimately recompile every process; a
    # REAL regression is an expensive Mosaic scan kernel recompiling.
    import re

    slow_recompiles = []
    for ln in err2.splitlines():
        mm = re.search(
            r"Finished XLA compilation of (\S+) in ([0-9.]+) sec", ln
        )
        if mm and float(mm.group(2)) >= 1.0:
            slow_recompiles.append((mm.group(1), float(mm.group(2))))
    assert not slow_recompiles, (
        f"2nd engine=tpu process recompiled expensive kernels "
        f"{slow_recompiles} - persistent cache miss (see "
        f"JAX_COMPILATION_CACHE_DIR)"
    )

    with tempfile.TemporaryDirectory() as tmp:
        p2, p3 = make_corpora(tmp)

        # config 2: UTF-16 + CJK hot maps
        argv2 = ["-t", "x", "-n", "4", "-e", "utf-16le", "-e", "Shift_JIS",
                 "-e", "gb18030", p2]
        ref2, _, _ = run_cli(argv2, "auto")
        got2, _, t_cjk = run_cli(argv2, "tpu")
        assert got2 == ref2, "engine=tpu diverges on the UTF-16+CJK config"
        assert ref2.count(b"\n") > 50, "UTF-16+CJK config found too little"

        # config 3: run-table feed (incl. the modal ISO-2022-JP path)
        argv3 = ["-t", "x", "-n", "4", "-e", "KOI8-R", "-e", "UTF-8",
                 "-e", "ISO-2022-JP", p3]
        ref3, _, _ = run_cli(argv3, "auto")
        got3, _, t_feed = run_cli(
            argv3, "tpu", extra_env={"STRINGSEXT_RUNTABLE_FEED": "1"})
        assert got3 == ref3, "engine=tpu diverges on the runtable-feed config"
        assert ref3.count(b"\n") > 100, "feed config found too little"

    print(json.dumps({
        "tpu_smoke": "ok",
        "configs": 3,
        "backend_first_run_s": round(t_tpu1, 1),
        "backend_cached_run_s": round(t_tpu2, 1),
        "auto_run_s": round(t_auto, 1),
        "cjk_utf16_tpu_run_s": round(t_cjk, 1),
        "runtable_feed_tpu_run_s": round(t_feed, 1),
        "second_run_xla_compiles": compiles,
        "second_run_cache_hits": cache_hits,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
