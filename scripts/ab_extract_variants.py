"""A/B: stacked (4,nb) cumsum vs 4 separate 1-D cumsums, interleaved
timing in one process, full 3-mission pipeline at 64 MiB.

Variant B monkeypatches runs._runs_from_block_counts with a copy whose
cumsums are separate; both variants trace through the UNJITTED
extract_runs_swar_blocks inside distinct outer jits, so the patch is
picked up at trace time."""

import sys, time
sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    size = 64 * 1024 * 1024
    iters, iters_short = 100, 25

    import jax
    import jax.numpy as jnp
    from bench import make_corpus
    from stringsext_tpu.ops import pallas_swar
    import stringsext_tpu.ops.runs as runs_mod
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

    stacked_impl = runs_mod._runs_from_block_counts

    def separate_impl(slab_flags, enc_blk, grep_blk, capacity, n):
        """Copy of _runs_from_block_counts with SEPARATE cumsums."""
        _SB = runs_mod._SB
        _BLOCK = runs_mod._BLOCK
        RunTable = runs_mod.RunTable
        nb0 = enc_blk.shape[0]
        pad = (-nb0) % _SB
        if pad:
            enc_blk = jnp.concatenate([enc_blk, jnp.zeros(pad, enc_blk.dtype)])
            grep_blk = jnp.concatenate([grep_blk, jnp.zeros(pad, grep_blk.dtype)])
        nb = enc_blk.shape[0]
        nsb = nb // _SB
        cum_start = jnp.cumsum(enc_blk & 0x3FF)
        cum_end = jnp.cumsum((enc_blk >> 10) & 0x3FF)
        cum_accept = jnp.cumsum((enc_blk >> 20) & 0x3FF)
        cum_grep = jnp.cumsum(grep_blk)
        nruns = cum_start[-1]

        k = jnp.arange(1, capacity + 1, dtype=jnp.int32)
        row_ok = k <= nruns

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

        def locate(blk_cum, which):
            b, prev = rank_lookup(blk_cum)
            local_k = k - prev
            a_e, l_e, g_e, rs_e, re_e = slab_flags(b)
            flags = {"rs": rs_e, "re": re_e}[which]
            local_cum = jnp.cumsum(flags, axis=1)
            pos = jnp.sum((local_cum < local_k[:, None]).astype(jnp.int32), axis=1)
            pos = jnp.minimum(pos, _BLOCK - 1)
            return jnp.minimum(b * _BLOCK + pos, n - 1), b, pos, (a_e, l_e, g_e)

        si_c, sb, sp, s_slabs = locate(cum_start, "rs")
        ei_c, eb, ep, e_slabs = locate(cum_end, "re")

        def pref_at(slab, blk_cum, bx, px):
            prev = jnp.where(bx > 0, blk_cum[jnp.maximum(bx - 1, 0)], 0)
            idxs = jnp.arange(_BLOCK, dtype=jnp.int32)[None, :]
            local = jnp.sum(jnp.where(idxs <= px[:, None], slab, 0), axis=1)
            return prev + local

        pc_e = pref_at(e_slabs[0], cum_accept, eb, ep)
        pc_s = pref_at(s_slabs[0], cum_accept, sb, sp)
        pg_e = pref_at(e_slabs[2], cum_grep, eb, ep)
        pg_s = pref_at(s_slabs[2], cum_grep, sb, sp)

        rowk = jnp.arange(capacity)
        len_at_e = e_slabs[1][rowk, ep]
        g_at_s = s_slabs[2][rowk, sp]

        start = jnp.where(row_ok, si_c, jnp.int32(2**31 - 1))
        end = jnp.where(row_ok, ei_c + len_at_e, 0)
        chars = jnp.where(row_ok, pc_e - pc_s + 1, 0)
        grep_hits = jnp.where(row_ok, pg_e - pg_s + g_at_s, 0)

        return RunTable(
            start=start, end=end, chars=chars, grep_hits=grep_hits,
            count=jnp.minimum(nruns, capacity), overflow=nruns > capacity,
        )

    raw_extract = runs_mod.extract_runs_swar_blocks.__wrapped__

    def make(impl):
        def step(w2d, xw):
            runs_mod._runs_from_block_counts = impl
            counts = pallas_swar.flagship_swar_counts(
                w2d, tile_rows=512, xor_word=xw, **swar_p
            )
            chk = jnp.sum(counts[:, :8].astype(jnp.int64))
            for mi in range(3):
                rt = raw_extract(
                    w2d.reshape(-1), counts[2 * mi], counts[2 * mi + 1],
                    capacity=1024, xor_word=xw, **eps[mi]
                )
                chk = chk + rt.count + jnp.sum(rt.start[:8].astype(jnp.int64))
            return chk

        def bench(w2d, kk):
            def body(i, acc):
                xw = (i % 2) * 0x01010101
                return acc + step(w2d, xw)
            return jax.lax.fori_loop(0, kk, body, jnp.int64(0))

        return jax.jit(bench)

    fa, fb = make(stacked_impl), make(separate_impl)
    for f in (fa, fb):
        int(f(data, 1)); int(f(data, iters_short)); int(f(data, iters))

    # sanity: identical checksums
    assert int(fa(data, 3)) == int(fb(data, 3)), "variant outputs differ!"

    def timed(f, kk):
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            int(f(data, kk))
            best = min(best, time.perf_counter() - t0)
        return best

    for name, f in (("stacked", fa), ("separate", fb),
                    ("stacked2", fa), ("separate2", fb)):
        dt = (timed(f, iters) - timed(f, iters_short)) / (iters - iters_short)
        print(f"{name:10s} {size / dt / 1e9:7.2f} GB/s ({dt*1e3:.3f} ms/iter)")


if __name__ == "__main__":
    main()
