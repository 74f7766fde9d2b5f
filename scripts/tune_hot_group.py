"""Sweep missions-per-launch for the all-41 hot_only pass (config 5)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def main():
    iters, short = 40, 10
    import jax, jax.numpy as jnp
    from stringsext_tpu.encodings import ALL_ENCODING_NAMES
    from stringsext_tpu.mission import Missions
    from stringsext_tpu.ops import pallas_swar
    from stringsext_tpu.ops.pallas_swar import cjk_hot_spec, swar_mission_spec

    names = ["ascii"] + list(ALL_ENCODING_NAMES)
    ms = Missions.new(flag_encoding=names)
    specs = []
    for m in ms.v:
        sp = swar_mission_spec(m) or cjk_hot_spec(m)
        if sp is not None:
            specs.append(sp)
    rng = np.random.default_rng(0)
    size = 32 * 1024 * 1024
    raw = rng.integers(0, 256, size=size, dtype=np.uint8)
    words = jax.device_put(jnp.asarray(raw.view(np.int32).reshape(-1, 128)))

    for gs in (8, 16, 20, 24, 28):
        groups = [tuple(specs[i:i + gs]) for i in range(0, len(specs), gs)]

        @jax.jit
        def looped(w, k, groups=tuple(groups)):
            def body(i, acc):
                xw = (i % 2) * 0x01010101
                for sg in groups:
                    c = pallas_swar.swar_counts(
                        w, sg, tile_rows=512, hot_only=True, xor_word=xw)
                    acc = acc + jnp.sum(c[:, ::64].astype(jnp.int64))
                return acc
            return jax.lax.fori_loop(0, k, body, jnp.int64(0))

        try:
            int(looped(words, 1))
            def t(k):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(looped(words, k))
                    best = min(best, time.perf_counter() - t0)
                return best
            per = (t(iters) - t(short)) / (iters - short)
            print(f"group={gs:3d} launches={len(groups):2d} "
                  f"{size/per/1e9:6.2f} GB/s ({per*1e3:.3f} ms/iter)",
                  flush=True)
        except Exception as e:
            print(f"group={gs} FAILED: {str(e).splitlines()[0][:100]}",
                  flush=True)
            break

if __name__ == "__main__":
    main()
