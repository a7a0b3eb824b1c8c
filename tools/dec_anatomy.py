"""Decode-VM cost anatomy: times stripped variants of the v2 piece loop to
attribute the ~190-245 cycles/op floor (PROFILE.md) to parse vs window read
vs merge RMW vs dynamic addressing.

Variants (trip counts identical across all of them — advancement depends
only on the SMEM parse, never on moved bytes):
  parse     branchless parse + state advance only; no vector work
  window    parse + the (2,128) funnel-window read; merge skipped
  full      the real v2 step (window + masked RMW merge)
  fixed     window + merge executed at a FIXED row address — isolates the
            cost of DYNAMIC addresses vs the memory ops themselves
A per-variant XOR accumulator folded into the output keeps the stripped
dataflow alive against DCE.

Usage: SNAPPYTPU_DEC_CORPUS=text python tools/dec_anatomy.py
(reuses tools/dec_profile.py's staged-input npz cache).
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
from snappytpu.kernels import decode_vm2 as V2
from snappytpu.kernels.decode_vm2 import (
    BS, COMP_OFF, COMP_ROWS, CW, OUT_BASE, OUT_ROWS, UROWS, PIECE_MAX,
    _pack_words, _window, _lanes, _lanes2, _rows2,
)
from snappytpu.kernels.decode_vm4 import _parse_at

t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

B = int(os.environ.get("SNAPPYTPU_DEC_B", "128"))
NQ = int(os.environ.get("SNAPPYTPU_DEC_NQ", "4"))
WHICH = os.environ.get("SNAPPYTPU_DEC_CORPUS", "text").split(",")
TAG = os.environ.get("SNAPPYTPU_DEC_CACHETAG", "r4")
VARIANTS = os.environ.get("SNAPPYTPU_DEC_VARIANTS", "parse,window,full,fixed").split(",")


def make_decoder(variant):
    def step(smem_ref, uni_ref, comp_len, out_len, st):
        ip, opc, err, rem, dist, src, done, acc = st
        hdr, ln, d, bad = _parse_at(smem_ref, ip, opc, comp_len, out_len)
        need = (err == 0) & (rem == 0) & (ip < comp_len)
        take = need & ~bad
        is_lit_p = d == 0
        ip = jnp.where(take, ip + hdr + jnp.where(is_lit_p, ln, 0), ip)
        src = jnp.where(take & is_lit_p, (ip - ln) + COMP_OFF, src)
        rem = jnp.where(take, ln, jnp.where(need, 0, rem))
        dist = jnp.where(take, d, dist)
        done = jnp.where(take, 0, done)
        err = err | (need & bad).astype(jnp.int32)

        live = (err == 0) & (rem > 0)
        is_lit = dist == 0
        ds_ = jnp.maximum(dist, 1)
        dd = done - done % ds_ + ds_
        lp = jnp.minimum(rem, PIECE_MAX)
        lp = jnp.where(is_lit, lp, jnp.minimum(lp, dd))
        dstb = OUT_BASE + opc
        s = jnp.where(is_lit, src, dstb - dd)
        s = jnp.clip(s, COMP_OFF, OUT_BASE + BS - 1)
        if variant == "fixed":
            s = jnp.int32(COMP_OFF + 64)
            dstb = OUT_BASE + 256

        if variant != "parse":
            u = _window(uni_ref, s, dstb)
            acc = acc ^ u
        if variant in ("full", "fixed"):
            dw = dstb >> 2
            dw_end = (dstb + lp + 3) >> 2
            rowd = jnp.clip(dw >> 7, 0, UROWS - 2)
            db = dstb & 3
            esh = (dstb + lp) & 3
            mask_first = (jnp.uint32(0xFFFFFFFF) << jnp.uint32(db * 8)).astype(jnp.int32)
            mask_last = jnp.where(
                esh == 0, jnp.int32(-1),
                ((jnp.uint32(1) << jnp.uint32(esh * 8)) - 1).astype(jnp.int32))
            widx = (rowd + _rows2()) * 128 + _lanes2()
            inside = live & (widx >= dw) & (widx < dw_end)
            m = jnp.where(inside, jnp.int32(-1), 0)
            m = jnp.where(widx == dw, m & mask_first, m)
            m = jnp.where(widx == dw_end - 1, m & mask_last, m)
            u2 = jnp.broadcast_to(u, (2, 128))
            d0 = uni_ref[pl.ds(rowd, 2), :]
            uni_ref[pl.ds(rowd, 2), :] = (u2 & m) | (d0 & ~m)

        adv = jnp.where(live, lp, 0)
        return (ip, opc + adv, err, rem - adv, dist,
                src + jnp.where(live & is_lit, lp, 0),
                done + jnp.where(live & ~is_lit, lp, 0), acc)

    def kernel(comp_lens_ref, out_lens_ref, smem_ref, comp_v_ref,
               out_ref, ok_ref, uni_ref):
        g = pl.program_id(0)
        comp_len = comp_lens_ref[g]
        out_len = out_lens_ref[g]
        uni_ref[0:1, :] = jnp.zeros((1, 128), jnp.int32)
        uni_ref[1:1 + COMP_ROWS, :] = comp_v_ref[0]
        uni_ref[1 + COMP_ROWS:UROWS, :] = jnp.zeros(
            (UROWS - COMP_ROWS - 1, 128), jnp.int32)

        z = jnp.int32(0)
        st0 = (z, z, z, z, z, z, z, jnp.zeros((1, 128), jnp.int32))

        def cond(st):
            ip, opc, err, rem = st[0], st[1], st[2], st[3]
            return (err == 0) & (opc < out_len) & ((rem > 0) | (ip < comp_len))

        def body(st):
            return step(smem_ref, uni_ref, comp_len, out_len,
                        step(smem_ref, uni_ref, comp_len, out_len, st))

        fin = lax.while_loop(cond, body, st0)
        orow = OUT_BASE // 512
        out_ref[0] = uni_ref[orow:orow + OUT_ROWS, :] ^ fin[7]
        ok_ref[0] = jnp.full((8, 128), fin[1], jnp.int32)

    @jax.jit
    def decode(comp_u8, comp_lens, out_lens):
        Bb = comp_u8.shape[0]
        comp_w = _pack_words(jnp.asarray(comp_u8), CW)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Bb,),
            in_specs=[
                pl.BlockSpec((CW,), lambda g, *_: (g,), memory_space=pltpu.SMEM),
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
        return pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((Bb, OUT_ROWS, 128), jnp.int32),
                jax.ShapeDtypeStruct((Bb, 8, 128), jnp.int32),
            ],
            grid_spec=grid_spec,
        )(jnp.asarray(comp_lens, jnp.int32), jnp.asarray(out_lens, jnp.int32),
          comp_w.reshape(Bb * CW), comp_w.reshape(Bb, COMP_ROWS, 128))
    return decode


makers = {"mixed": corpus.mixed, "text": corpus.text,
          "runs": corpus.low_entropy, "random": corpus.random_bytes}
enc = jax.jit(lambda b, n: E.encode_block_core(b, n, True))
log(f"backend {jax.default_backend()}")

for which in WHICH:
    sets = []
    for q in range(NQ):
        cache = f"/tmp/decprof_{TAG}_{which}_{q}_{B}.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            comp_np, totals_np, lens_np = z["comp"], z["totals"], z["lens"]
        else:
            data = np.frombuffer(makers[which](B * C.MAX_BLOCK_SIZE, seed=300 + q), np.uint8)
            blocks_np, lens_np = framing.pack_blocks(data)
            bl = jax.device_put(jnp.asarray(blocks_np[:B]))
            ll0 = jax.device_put(jnp.asarray(lens_np[:B], jnp.int32))
            comp, totals = enc(bl, ll0)
            comp_np, totals_np = np.asarray(comp), np.asarray(totals)
            lens_np = np.asarray(lens_np[:B], np.int32)
            np.savez_compressed(cache, comp=comp_np, totals=totals_np, lens=lens_np)
        sets.append((jax.device_put(jnp.asarray(comp_np)),
                     jax.device_put(jnp.asarray(totals_np)),
                     jax.device_put(jnp.asarray(lens_np, jnp.int32))))
    _ = int(np.asarray(jnp.sum(sets[-1][0][..., ::997].astype(jnp.int32))))
    log(f"{which}: staged")
    for variant in VARIANTS:
        dec = make_decoder(variant)
        g = jax.jit(lambda c, t, l: [jnp.sum(x[..., ::997].astype(jnp.int32))
                                     for x in dec(c, t, l)])
        outs = [g(*a) for a in sets]
        _ = [int(np.asarray(r[0])) for r in outs]
        best = 1e9
        for _r in range(3):
            t1 = time.perf_counter()
            outs = [g(*a) for a in sets]
            _ = [int(np.asarray(r[0])) for r in outs]
            best = min(best, (time.perf_counter() - t1) / len(sets))
        mbs = B * 64 * 1024 / 1e6 / best
        log(f"{which:7s} {variant:7s} {best*1000:8.2f} ms/batch  {mbs:7.1f} MB/s")
log("DONE")
