"""Break the run-extraction cost into sub-stages on the real chip.

Variants (all include the fused counts kernel):
  counts   - kernel only
  cumsums  - + the 4 block cumsums per mission
  rank     - + rank lookups (b, prev) for start+end per mission
  slabs    - + slab gather + field re-derivation (no prefix sums)
  full     - complete extraction (= bench pipeline)

Usage: python scripts/profile_extract2.py [size_mb] [iters]
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
    from stringsext_tpu.ops import pallas_swar, runs as R
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
    capacity = 1024
    _SB = R._SB

    def partial_extract(w2d, enc_blk, grep_blk, ep, stage, xw):
        """Re-create _runs_from_block_counts up to `stage`."""
        nb0 = enc_blk.shape[0]
        pad = (-nb0) % _SB
        if pad:
            enc_blk = jnp.concatenate([enc_blk, jnp.zeros(pad, enc_blk.dtype)])
        nb = enc_blk.shape[0]
        nsb = nb // _SB
        cum_start = jnp.cumsum(enc_blk & 0x3FF)
        cum_end = jnp.cumsum((enc_blk >> 10) & 0x3FF)
        cum_accept = jnp.cumsum((enc_blk >> 20) & 0x3FF)
        cum_grep = jnp.cumsum(grep_blk[:nb0])
        if stage == "cumsums":
            return (cum_start[-1] + cum_end[-1] + cum_accept[-1]
                    + cum_grep[-1]).astype(jnp.int64)

        k = jnp.arange(1, capacity + 1, dtype=jnp.int32)

        def rank_lookup(blk_cum):
            c2 = blk_cum.reshape(nsb, _SB)
            sb_last = c2[:, -1]
            if nsb > _SB:
                pad2 = (-nsb) % _SB
                sb_pad = (
                    jnp.concatenate(
                        [sb_last, jnp.full((pad2,), blk_cum[-1], blk_cum.dtype)]
                    ) if pad2 else sb_last
                )
                nss = sb_pad.shape[0] // _SB
                c3 = sb_pad.reshape(nss, _SB)
                ss_last = c3[:, -1]
                lt_ss = ss_last[None, :] < k[:, None]
                b_ss = jnp.minimum(jnp.sum(lt_ss.astype(jnp.int32), 1), nss - 1)
                win_sb = c3[b_ss]
                pos_ss = jnp.sum((win_sb < k[:, None]).astype(jnp.int32), 1)
                b_sb = jnp.minimum(b_ss * _SB + pos_ss, nsb - 1)
            else:
                lt_sb = sb_last[None, :] < k[:, None]
                b_sb = jnp.minimum(jnp.sum(lt_sb.astype(jnp.int32), 1), nsb - 1)
            win = c2[b_sb]
            pos_sb = jnp.sum((win < k[:, None]).astype(jnp.int32), 1)
            b = jnp.minimum(b_sb * _SB + pos_sb, nb0 - 1)
            prev = jnp.where(b > 0, blk_cum[jnp.maximum(b - 1, 0)], 0)
            return b, prev

        sb_, sprev = rank_lookup(cum_start)
        eb_, eprev = rank_lookup(cum_end)
        if stage == "rank":
            return (jnp.sum(sb_ + eb_) + jnp.sum(sprev + eprev)).astype(jnp.int64)

        # slab gather + re-derivation (mirror extract_runs_swar_blocks)
        from stringsext_tpu.ops.pallas_swar import (
            _SlabPanel, swar_utf8_panel, swar_utf16_panel, swar_flags,
        )
        from stringsext_tpu.ops.runs import _expand_bytes

        w = w2d.reshape(-1)
        nw = w.shape[0]
        bw = 128
        wm = w.reshape(nb0, bw)

        def slab_flags(b):
            base = b * bw
            body = wm[b] ^ xw

            def margin(off):
                idx = base + off
                word = w[jnp.clip(idx, 0, nw - 1)] ^ xw
                return jnp.where((idx >= 0) & (idx < nw), word, 0)[:, None]

            slabW = jnp.concatenate(
                [margin(-2), margin(-1), body, margin(bw), margin(bw + 1)],
                axis=1,
            )
            P = _SlabPanel(slabW)
            if ep["kind"] == "utf8":
                F = swar_utf8_panel(P, ep["af_iv"], ep["ubf_iv"], ep["grep"])
            else:
                F = swar_utf16_panel(P, ep["cp_iv"], ep["grep"], ep["be"])
            z = jnp.zeros_like(F[:, :1])
            Fp = jnp.concatenate([z, F[:, :-1]], axis=1)
            Fn = jnp.concatenate([F[:, 1:], z], axis=1)
            a, l, gg, rs, re = swar_flags(F, Fp, Fn)
            return tuple(_expand_bytes(x[:, 2:2 + bw]) for x in (a, l, gg, rs, re))

        s_slabs = slab_flags(sb_)
        e_slabs = slab_flags(eb_)
        return (jnp.sum(s_slabs[0][:, ::64]) + jnp.sum(e_slabs[3][:, ::64])
                ).astype(jnp.int64)

    def mk(stage):
        def step(w2d, xw):
            counts = pallas_swar.flagship_swar_counts(
                w2d, tile_rows=512, xor_word=xw, **swar_p
            )
            chk = jnp.sum(counts[:, :8].astype(jnp.int64))
            if stage == "counts":
                return chk
            for mi in range(3):
                if stage == "fullx":
                    rt = R.extract_runs_swar_blocks(
                        w2d.reshape(-1), counts[2 * mi], counts[2 * mi + 1],
                        capacity=capacity, xor_word=xw, **eps[mi]
                    )
                    chk = chk + rt.count + jnp.sum(rt.start[:8].astype(jnp.int64))
                else:
                    chk = chk + partial_extract(
                        w2d, counts[2 * mi], counts[2 * mi + 1], eps[mi],
                        stage, xw,
                    )
            return chk

        def bench(w2d, kk):
            def body(i, acc):
                xw = (i % 2) * 0x01010101
                return acc + step(w2d, xw)
            return jax.lax.fori_loop(0, kk, body, jnp.int64(0))

        return jax.jit(bench)

    for name in ("counts", "cumsums", "rank", "slabs", "fullx"):
        fn = mk(name)
        int(fn(data, 1))
        int(fn(data, iters_short))
        int(fn(data, iters))

        def timed(kk):
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                int(fn(data, kk))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (timed(iters) - timed(iters_short)) / (iters - iters_short)
        print(f"{name:8s} {size / dt / 1e9:7.2f} GB/s  ({dt * 1e3:.3f} ms/iter)")


if __name__ == "__main__":
    main()
