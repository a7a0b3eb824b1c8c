"""Tape-VM chain decomposition probe: what serializes the movement loop?

Variants (SNAPPYTPU_TAPE_MODE):
  full-D1 / full-D3   movement with 1- or 3-deep record load-ahead
  loads               SMEM record loads + loop only (movement skipped):
                      isolates loop+load cost from the RMW chain
  const-dst           real loads + real windows, but every merge lands on a
                      fixed row: RMW with compiler-provable addresses
  acc                 register-resident output tile: the 2-row window at
                      the write cursor lives in loop-carried vector values;
                      merges are vector selects, VMEM writes happen once
                      per 512-byte row advance, reads substitute the tile
                      rows.  Probes whether cutting dynamic VMEM accesses
                      from ~3/piece to ~1/piece breaks the text plateau.
Corpus: text (the flat regime), mixed for contrast.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from snappytpu.bench import corpus
from snappytpu.format import constants as C
from snappytpu.stream import framing
from snappytpu.kernels import encode_v2 as E
from snappytpu.kernels.decode_vm2 import (
    COMP_OFF, COMP_ROWS, CW, OUT_BASE, OUT_ROWS, UROWS,
    _pack_words, _pattern, _piece, _merge2, _window)
from snappytpu.kernels import decode_tape as DT

t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

B, NQ = 128, 4
MODE = os.environ.get("SNAPPYTPU_TAPE_MODE", "full-D3")
log(f"backend {jax.default_backend()} mode={MODE}")


from snappytpu.kernels.decode_vm2 import _lanes, _lanes2, _rows2


def make_acc_kernel():
    """Movement loop with the output write-window held in loop-carried
    vector values (R: (2,128) rows at [wbase, wbase+2))."""

    def window_acc(uni_ref, src, dst, wbase, R):
        db = dst & 3
        vs = src - db
        ws = vs >> 2
        srow = ws >> 7
        k = ws & 127
        sh = jnp.uint32((vs & 3) * 8)
        kd = (dst >> 2) & 127
        pair = uni_ref[pl.ds(srow, 2), :]
        dlt = wbase - srow
        pair = jnp.where(
            dlt == 0, R,
            jnp.where(dlt == 1,
                      jnp.concatenate([pair[0:1], R[0:1]], axis=0), pair))
        rot = (kd - k) & 127
        pr = pltpu.roll(pair, rot, 1)
        jm = (_lanes() - kd) & 127
        w = jnp.where(jm < 128 - k, pr[0:1, :], pr[1:2, :])
        wn = pltpu.roll(w, 127, 1)
        uw = w.astype(jnp.uint32)
        un = wn.astype(jnp.uint32)
        return jnp.where(
            sh == 0, w,
            ((uw >> sh) | (un << (jnp.uint32(32) - sh))).astype(jnp.int32))

    def merge_acc(R, u, dst, lp, wbase):
        dw = dst >> 2
        dw_end = (dst + lp + 3) >> 2
        db = dst & 3
        esh = (dst + lp) & 3
        mask_first = (jnp.uint32(0xFFFFFFFF) << jnp.uint32(db * 8)).astype(jnp.int32)
        mask_last = jnp.where(
            esh == 0, jnp.int32(-1),
            ((jnp.uint32(1) << jnp.uint32(esh * 8)) - 1).astype(jnp.int32))
        widx = (wbase + _rows2()) * 128 + _lanes2()
        inside = (widx >= dw) & (widx < dw_end)
        m = jnp.where(inside, jnp.int32(-1), 0)
        m = jnp.where(widx == dw, m & mask_first, m)
        m = jnp.where(widx == dw_end - 1, m & mask_last, m)
        u2 = jnp.broadcast_to(u, (2, 128))
        return (u2 & m) | (R & ~m)

    def pattern_word(u, dst, dist):
        kd = (dst >> 2) & 127
        db = dst & 3
        lanes = _lanes()
        u0 = jnp.sum(jnp.where(lanes == kd, u, 0)).astype(jnp.uint32)
        u1 = jnp.sum(jnp.where(lanes == ((kd + 1) & 127), u, 0)).astype(jnp.uint32)
        sh = jnp.uint32(db * 8)
        v = jnp.where(db == 0, u0,
                      (u0 >> sh) | (u1 << (jnp.uint32(32) - sh))).astype(jnp.int32)
        uv = v.astype(jnp.uint32)
        p1 = (v & 0xFF) * jnp.int32(0x01010101)
        base2 = (v & 0xFFFF) * jnp.int32(0x00010001)
        ub2 = base2.astype(jnp.uint32)
        p2 = jnp.where((db & 1) == 0, base2,
                       ((ub2 >> 8) | (ub2 << 24)).astype(jnp.int32))
        p4 = jnp.where(db == 0, v,
                       ((uv << sh) | (uv >> (jnp.uint32(32) - sh))).astype(jnp.int32))
        return jnp.where(dist == 1, p1, jnp.where(dist == 2, p2, p4))

    def kern(nrecs_ref, tape_ref, comp_v_ref, out_ref, ok_ref, uni_ref):
        nr = nrecs_ref[pl.program_id(0)]
        uni_ref[0:1, :] = jnp.zeros((1, 128), jnp.int32)
        uni_ref[1 : 1 + COMP_ROWS, :] = comp_v_ref[0]
        uni_ref[1 + COMP_ROWS : UROWS, :] = jnp.zeros(
            (UROWS - COMP_ROWS - 1, 128), jnp.int32)

        def load(r):
            rc = jnp.minimum(r, DT.TAPE_MAX - 1)
            return tape_ref[2 * rc], tape_ref[2 * rc + 1]

        def step(st):
            r, q, wbase, R = st
            nxt = load(r + 1)
            w0, w1 = q
            lp = w0 >> 20
            pk2 = (w0 >> 18) & 3
            live = r < nr
            dst = w1
            rowd = dst >> 9
            adv = live & (rowd != wbase)

            @pl.when(adv)
            def _():
                uni_ref[pl.ds(wbase, 1), :] = R[0:1]

            R = jnp.where(
                adv,
                jnp.concatenate([R[1:2], jnp.zeros((1, 128), jnp.int32)], axis=0),
                R)
            wbase = jnp.where(adv, rowd, wbase)

            src = jnp.where(pk2 == 0, w0 & 0x3FFFF,
                            dst - jnp.where(pk2 == 3, 4, pk2))
            u = window_acc(uni_ref, src, dst, wbase, R)
            u = jnp.where(pk2 == 0, u,
                          pattern_word(u, dst, jnp.where(pk2 == 3, 4, pk2)))
            Rm = merge_acc(R, u, dst, lp, wbase)
            R = jnp.where(live, Rm, R)
            return r + 1, nxt, wbase, R

        r0 = jnp.int32(0)
        wb0 = jnp.int32(OUT_BASE // 512)
        R0 = jnp.zeros((2, 128), jnp.int32)
        st = lax.while_loop(lambda st: st[0] < nr,
                            lambda st: step(step(st)),
                            (r0, load(r0), wb0, R0))
        _, _, wbase, R = st
        uni_ref[pl.ds(wbase, 2), :] = R
        orow = OUT_BASE // 512
        out_ref[0] = uni_ref[orow : orow + OUT_ROWS, :]
        ok_ref[0] = jnp.full((8, 128), (nr >= 0).astype(jnp.int32), jnp.int32)

    return kern


def make_rowbatch_kernel(K=4):
    """Row-batched merges: K pieces per iteration share ONE write tile held
    in ITERATION-LOCAL registers — read the (2,128) pair once, merge K
    pieces as pure vector selects (window reads substitute the pending
    tile rows), flush once.  Loop carries stay scalar, so the `acc` spill
    failure does not apply.  Dynamic VMEM accesses drop from ~3/piece to
    ~(K+2)/K per piece."""

    def window_sub(uni_ref, src, dst, tbase, tile):
        db = dst & 3
        vs = src - db
        ws = vs >> 2
        srow = ws >> 7
        k = ws & 127
        sh = jnp.uint32((vs & 3) * 8)
        kd = (dst >> 2) & 127
        pair = uni_ref[pl.ds(srow, 2), :]
        dlt = tbase - srow
        pair = jnp.where(
            dlt == 0, tile,
            jnp.where(dlt == 1,
                      jnp.concatenate([pair[0:1], tile[0:1]], axis=0), pair))
        rot = (kd - k) & 127
        pr = pltpu.roll(pair, rot, 1)
        jm = (_lanes() - kd) & 127
        w = jnp.where(jm < 128 - k, pr[0:1, :], pr[1:2, :])
        wn = pltpu.roll(w, 127, 1)
        uw = w.astype(jnp.uint32)
        un = wn.astype(jnp.uint32)
        return jnp.where(
            sh == 0, w,
            ((uw >> sh) | (un << (jnp.uint32(32) - sh))).astype(jnp.int32))

    def merge_tile(tile, u, dst, lp, tbase):
        dw = dst >> 2
        dw_end = (dst + lp + 3) >> 2
        db = dst & 3
        esh = (dst + lp) & 3
        mask_first = (jnp.uint32(0xFFFFFFFF) << jnp.uint32(db * 8)).astype(jnp.int32)
        mask_last = jnp.where(
            esh == 0, jnp.int32(-1),
            ((jnp.uint32(1) << jnp.uint32(esh * 8)) - 1).astype(jnp.int32))
        widx = (tbase + _rows2()) * 128 + _lanes2()
        inside = (widx >= dw) & (widx < dw_end)
        m = jnp.where(inside, jnp.int32(-1), 0)
        m = jnp.where(widx == dw, m & mask_first, m)
        m = jnp.where(widx == dw_end - 1, m & mask_last, m)
        u2 = jnp.broadcast_to(u, (2, 128))
        return (u2 & m) | (tile & ~m)

    def pattern_word(u, dst, dist):
        kd = (dst >> 2) & 127
        db = dst & 3
        lanes = _lanes()
        u0 = jnp.sum(jnp.where(lanes == kd, u, 0)).astype(jnp.uint32)
        u1 = jnp.sum(jnp.where(lanes == ((kd + 1) & 127), u, 0)).astype(jnp.uint32)
        sh = jnp.uint32(db * 8)
        v = jnp.where(db == 0, u0,
                      (u0 >> sh) | (u1 << (jnp.uint32(32) - sh))).astype(jnp.int32)
        uv = v.astype(jnp.uint32)
        p1 = (v & 0xFF) * jnp.int32(0x01010101)
        base2 = (v & 0xFFFF) * jnp.int32(0x00010001)
        ub2 = base2.astype(jnp.uint32)
        p2 = jnp.where((db & 1) == 0, base2,
                       ((ub2 >> 8) | (ub2 << 24)).astype(jnp.int32))
        p4 = jnp.where(db == 0, v,
                       ((uv << sh) | (uv >> (jnp.uint32(32) - sh))).astype(jnp.int32))
        return jnp.where(dist == 1, p1, jnp.where(dist == 2, p2, p4))

    def kern(nrecs_ref, tape_ref, comp_v_ref, out_ref, ok_ref, uni_ref):
        nr = nrecs_ref[pl.program_id(0)]
        uni_ref[0:1, :] = jnp.zeros((1, 128), jnp.int32)
        uni_ref[1 : 1 + COMP_ROWS, :] = comp_v_ref[0]
        uni_ref[1 + COMP_ROWS : UROWS, :] = jnp.zeros(
            (UROWS - COMP_ROWS - 1, 128), jnp.int32)

        def load(r):
            rc = jnp.minimum(r, DT.TAPE_MAX - 1)
            return tape_ref[2 * rc], tape_ref[2 * rc + 1]

        def body(st):
            r, tbase = st
            recs = [load(r + j) for j in range(K)]
            tile = uni_ref[pl.ds(tbase, 2), :]
            for j in range(K):
                w0, w1 = recs[j]
                live = (r + j) < nr
                lp = w0 >> 20
                pk2 = (w0 >> 18) & 3
                dst = w1
                rowd = dst >> 9
                adv = live & (rowd > tbase)

                @pl.when(adv)
                def _(tb=tbase, t0=tile):
                    uni_ref[pl.ds(tb, 1), :] = t0[0:1]

                tile = jnp.where(
                    adv,
                    jnp.concatenate(
                        [tile[1:2], jnp.zeros((1, 128), jnp.int32)], axis=0),
                    tile)
                tbase = jnp.where(adv, rowd, tbase)
                pat = jnp.where(pk2 == 3, 4, pk2)
                src = jnp.where(pk2 == 0, w0 & 0x3FFFF, dst - pat)
                u = window_sub(uni_ref, src, dst, tbase, tile)
                u = jnp.where(pk2 == 0, u, pattern_word(u, dst, pat))
                nt = merge_tile(tile, u, dst, lp, tbase)
                tile = jnp.where(live, nt, tile)
            uni_ref[pl.ds(tbase, 2), :] = tile
            return r + K, tbase

        st = lax.while_loop(lambda st: st[0] < nr, body,
                            (jnp.int32(0), jnp.int32(OUT_BASE // 512)))
        orow = OUT_BASE // 512
        out_ref[0] = uni_ref[orow : orow + OUT_ROWS, :]
        ok_ref[0] = jnp.full((8, 128), (nr >= 0).astype(jnp.int32), jnp.int32)

    return kern


def make_kernel(mode):
    if mode == "acc":
        return make_acc_kernel()
    if mode.startswith("rowbatch"):
        return make_rowbatch_kernel(int(mode[8:] or 4))
    D = 3 if mode == "full-D3" else 1

    def kern(nrecs_ref, tape_ref, comp_v_ref, out_ref, ok_ref, uni_ref):
        nr = nrecs_ref[pl.program_id(0)]
        uni_ref[0:1, :] = jnp.zeros((1, 128), jnp.int32)
        uni_ref[1 : 1 + COMP_ROWS, :] = comp_v_ref[0]
        uni_ref[1 + COMP_ROWS : UROWS, :] = jnp.zeros(
            (UROWS - COMP_ROWS - 1, 128), jnp.int32)

        def load(r):
            rc = jnp.minimum(r, DT.TAPE_MAX - 1)
            return tape_ref[2 * rc], tape_ref[2 * rc + 1]

        def move(w0, w1, live):
            lp = w0 >> 20
            pk2 = (w0 >> 18) & 3
            if mode == "loads":
                # consume the record so loads are not DCE'd: fold into a
                # guard-row write only when a sentinel (never) fires
                @pl.when(live & (lp + pk2 + w1 < -1))
                def _():
                    uni_ref[0:1, :] = jnp.full((1, 128), w0, jnp.int32)
                return
            dst = jnp.int32(OUT_BASE) if mode == "const-dst" else w1

            @pl.when(live & (pk2 == 0))
            def _():
                _piece(uni_ref, w0 & 0x3FFFF, dst, lp)

            @pl.when(live & (pk2 > 0))
            def _():
                _pattern(uni_ref, dst, lp, jnp.where(pk2 == 3, 4, pk2))

        def step(st):
            r, q = st
            nxt = load(r + D)
            w0, w1 = q[0]
            move(w0, w1, r < nr)
            return r + 1, q[1:] + (nxt,)

        init_q = tuple(load(jnp.int32(k)) for k in range(D))
        st = lax.while_loop(lambda st: st[0] < nr,
                            lambda st: step(step(st)), (jnp.int32(0), init_q))
        orow = OUT_BASE // 512
        out_ref[0] = uni_ref[orow : orow + OUT_ROWS, :]
        ok_ref[0] = jnp.full((8, 128), (nr >= 0).astype(jnp.int32), jnp.int32)

    return kern


def run_mode(mode):
    kern = make_kernel(mode)

    @jax.jit
    def runner(tapes, nrecs, comp_u8):
        Bb = comp_u8.shape[0]
        comp_w = _pack_words(jnp.asarray(comp_u8), CW)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Bb,),
            in_specs=[
                pl.BlockSpec((2 * DT.TAPE_MAX,), lambda g, *_: (g,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, COMP_ROWS, 128), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, OUT_ROWS, 128), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((UROWS, 128), jnp.int32)],
        )
        out_w, okm = pl.pallas_call(
            kern,
            out_shape=[
                jax.ShapeDtypeStruct((Bb, OUT_ROWS, 128), jnp.int32),
                jax.ShapeDtypeStruct((Bb, 8, 128), jnp.int32),
            ],
            grid_spec=grid_spec,
        )(jnp.asarray(nrecs, jnp.int32),
          jnp.asarray(tapes, jnp.int32).reshape(Bb * 2 * DT.TAPE_MAX),
          comp_w.reshape(Bb, COMP_ROWS, 128))
        return out_w, okm

    return runner


enc = jax.jit(lambda b, n: E.encode_block_core(b, n, True))
import hashlib
with open(E.__file__, "rb") as _f:
    TAG = hashlib.sha256(_f.read()).hexdigest()[:12] + "-dense"

from snappytpu import cpu as scpu

for which, mk in [("text", corpus.text), ("mixed", corpus.mixed)]:
    sets = []
    for q in range(NQ):
        cache = f"/tmp/decprof_{TAG}_{which}_{q}_{B}.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            comp_np, totals_np, lens_np = z["comp"], z["totals"], z["lens"]
        else:
            data = np.frombuffer(mk(B * C.MAX_BLOCK_SIZE, seed=300 + q), np.uint8)
            blocks_np, lens_np = framing.pack_blocks(data)
            comp, totals = enc(jax.device_put(jnp.asarray(blocks_np[:B])),
                               jax.device_put(jnp.asarray(lens_np[:B], jnp.int32)))
            comp_np, totals_np = np.asarray(comp), np.asarray(totals)
            lens_np = np.asarray(lens_np[:B], np.int32)
            np.savez_compressed(cache, comp=comp_np, totals=totals_np, lens=lens_np)
        tapes, nrecs = scpu.build_tapes(comp_np, totals_np, lens_np,
                                        COMP_OFF, OUT_BASE, DT.TAPE_MAX)
        sets.append((jax.device_put(jnp.asarray(tapes)),
                     jax.device_put(jnp.asarray(nrecs)),
                     jax.device_put(jnp.asarray(comp_np))))
    _ = int(np.asarray(jnp.sum(sets[-1][0][..., ::997])))
    log(f"{which}: staged")
    ref_out = None
    for mode in MODE.split(","):
        runner = run_mode(mode)
        if os.environ.get("SNAPPYTPU_TAPE_VERIFY", "1") == "1" and mode != "loads":
            ow, km = runner(*sets[0])
            ow = np.asarray(ow)
            if ref_out is None:
                ref_out = ow
            else:
                assert (ow == ref_out).all(), f"{which}/{mode}: output mismatch"
                log(f"{which} {mode}: byte-equal vs first mode")
        g = jax.jit(lambda t, n, c: [jnp.sum(x[..., ::997].astype(jnp.int32))
                                     for x in runner(t, n, c)])
        outs = [g(*a) for a in sets]
        _ = [int(np.asarray(r[0])) for r in outs]
        best = 1e9
        for _r in range(3):
            t1 = time.perf_counter()
            outs = [g(*a) for a in sets]
            _ = [int(np.asarray(r[0])) for r in outs]
            best = min(best, (time.perf_counter() - t1) / len(sets))
        log(f"{which:6s} {mode:9s} {best*1000:8.2f} ms/batch  "
            f"{B*64*1024/1e6/best:7.1f} MB/s")
log("DONE")
