"""Pallas decode VM v3 — interleaved branchless piece interpreter.

The v2 VM (decode_vm2.py) decodes ONE block per grid program with a
sequential piece loop; measured ~245 cycles/op on text where the
dataflow itself is only ~70 issues — the loop is LATENCY-bound: each
step's parse depends on the previous step's instruction pointer, and the
window-read -> funnel -> merge chain serializes behind the RMW hazard,
so the scalar and vector pipelines drain between pieces.

v3 attacks the latency, not the op count:

  K-way interleave   one grid program decodes K=8 independent blocks,
                     their interpreter states held in unrolled scalar
                     tuples.  Each loop iteration advances every block
                     by one piece; the K dataflow chains share no data,
                     so the scheduler fills the dependency stalls of one
                     block with the work of the others.
  disjoint refs      each block parses from its OWN SMEM ref and moves
                     bytes in its OWN VMEM image scratch ref — provable
                     non-aliasing, so Mosaic is free to overlap the K
                     read-modify-write chains (a single shared image
                     would serialize them behind may-alias hazards; the
                     r2 K=4 experiment failed exactly there).
  branchless step    no pl.when, no lax.cond, no absorb while-loop: the
                     parse dataflow always runs and commits via selects;
                     literal pieces, copy pieces and dist-{1,2,4}
                     pattern fills share ONE window read and ONE masked
                     RMW whose mask is zeroed for finished blocks.
                     (Predicated regions force Mosaic to serialize at
                     branch boundaries — the measured reason the r2
                     guarded interleave was SLOWER.)

Piece semantics (window read, masked 2-row merge, period-multiple
self-overlap schedule, pattern fill) are v2's, byte for byte; the accept
set matches decode_vm2/model/C++ exactly (same parse-time validation,
fuzz-differential tested).  Copy-chain coalescing is dropped: it saved
merges on run streams but needed a data-dependent peek-parse loop per
op; interleaving recovers the throughput without it.

Reference behavior reimplemented here: the byte-forward overlapping copy
and tag dispatch of snappy_decompression.c:273-280/:290-333, with
deterministic validation replacing its dead plausibility check
(snappy_decompression.c:262).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format import constants as C
from .decode_vm2 import (
    BS,
    COMP_OFF,
    COMP_ROWS,
    CW,
    OUT_BASE,
    OUT_ROWS,
    PAD_OUT,
    PIECE_MAX,
    UROWS,
    _lanes,
    _lanes2,
    _pack_words,
    _rows2,
    _unpack_words,
    _window,
)

# Blocks interleaved per grid program.  Upper bound is SMEM: each block's
# parse stream is a 73728-byte SMEM window, double-buffered by the pipeline,
# against the chip's 1 MB SMEM — K = 8 measured 1.13 MB and was rejected by
# the compiler.  K = 6 measured FLAT on text (the ~42 live scalars plus six
# vector dataflows hit the register-pressure wall that tools/probe_scalar.py's
# bigstate sweep predicts); small K stays under it.
K = 6


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _merge2_live(uni_ref, u, dst, lp, live):
    """v2's single (2, 128)-row masked RMW with a liveness gate: dead
    blocks execute the same instructions with an all-zero mask (and a
    row address clamped in range), writing nothing."""
    dw = dst >> 2
    dw_end = (dst + lp + 3) >> 2
    rowd = jnp.clip(dw >> 7, 0, UROWS - 2)
    db = dst & 3
    esh = (dst + lp) & 3
    mask_first = (jnp.uint32(0xFFFFFFFF) << jnp.uint32(db * 8)).astype(jnp.int32)
    mask_last = jnp.where(
        esh == 0, jnp.int32(-1), ((jnp.uint32(1) << jnp.uint32(esh * 8)) - 1).astype(jnp.int32)
    )

    widx = (rowd + _rows2()) * 128 + _lanes2()
    inside = live & (widx >= dw) & (widx < dw_end)
    m = jnp.where(inside, jnp.int32(-1), 0)
    m = jnp.where(widx == dw, m & mask_first, m)
    m = jnp.where(widx == dw_end - 1, m & mask_last, m)
    u2 = jnp.broadcast_to(u, (2, 128))
    d0 = uni_ref[pl.ds(rowd, 2), :]
    uni_ref[pl.ds(rowd, 2), :] = (u2 & m) | (d0 & ~m)


def _parse_at(smem_ref, ip, opc_eff, comp_len, out_len):
    """Branchless op decode at comp byte ip (identical accept set to
    decode_vm2._block_loop.parse_at; see there for the validation
    rationale).  Returns (hdr, ln, dist [0 => literal], bad)."""
    wi = ip >> 2
    w0 = smem_ref[jnp.clip(wi, 0, CW - 1)]
    w1 = smem_ref[jnp.clip(wi + 1, 0, CW - 1)]
    sh = (ip & 3) * 8
    u0 = w0.astype(jnp.uint32)
    u1 = w1.astype(jnp.uint32)
    v = jnp.where(
        sh == 0, u0, (u0 >> jnp.uint32(sh)) | (u1 << jnp.uint32((32 - sh) % 32))
    ).astype(jnp.int32)
    tag = v & 0xFF
    b1 = (v >> 8) & 0xFF
    b2 = (v >> 16) & 0xFF
    b3 = lax.shift_right_logical(v, 24) & 0xFF
    b4 = lax.shift_right_logical(w1, sh) & 0xFF

    kind = tag & 3
    code = tag >> 2
    is_lit = kind == C.TAG_LITERAL
    extra = jnp.where(is_lit, jnp.clip(code - (C.LITERAL_CODE_1BYTE - 1), 0, 4), 0)
    hdr = jnp.where(
        is_lit,
        1 + extra,
        jnp.where(kind == C.TAG_COPY1, 2, jnp.where(kind == C.TAG_COPY2, 3, 5)),
    )
    lit_len = jnp.where(
        extra == 0,
        code + 1,
        jnp.where(
            extra == 1,
            b1 + 1,
            jnp.where(
                extra == 2,
                (b1 | (b2 << 8)) + 1,
                jnp.where(
                    extra == 3,
                    (b1 | (b2 << 8) | (b3 << 16)) + 1,
                    (b1 | (b2 << 8) | (b3 << 16) | ((b4 & 0x3F) << 24)) + 1,
                ),
            ),
        ),
    )
    cp_len = jnp.where(kind == C.TAG_COPY1, (code & 7) + 4, code + 1)
    d = jnp.where(
        kind == C.TAG_COPY1,
        ((code >> 3) << 8) | b1,
        jnp.where(kind == C.TAG_COPY2, b1 | (b2 << 8), b1 | (b2 << 8) | (b3 << 16)),
    )
    ln = jnp.where(is_lit, lit_len, cp_len)

    bad = (ip + hdr > comp_len) | (opc_eff + ln > out_len)
    bad = bad | (is_lit & (ip + hdr + ln > comp_len))
    bad = bad | (~is_lit & ((d < 1) | (d > opc_eff)))
    bad = bad | ((kind == C.TAG_COPY4) & (b4 != 0))
    bad = bad | (is_lit & (extra == 4) & ((b4 & 0xC0) != 0))
    return hdr, ln, jnp.where(is_lit, 0, d), bad


def _step_block(smem_ref, uni_ref, comp_len, out_len, st):
    """One branchless piece for one block: select-committed parse when the
    current op is exhausted, then one unified window read + masked RMW
    covering literal, copy and pattern pieces."""
    ip, opc, err, rem, dist, src, done = st

    # -- parse (dataflow always runs; committed only when needed) --
    hdr, ln, d, bad = _parse_at(smem_ref, ip, opc, comp_len, out_len)
    need = (err == 0) & (rem == 0) & (ip < comp_len)
    take = need & ~bad
    is_lit_p = d == 0
    ip = jnp.where(take, ip + hdr + jnp.where(is_lit_p, ln, 0), ip)
    src = jnp.where(take & is_lit_p, (ip - ln) + COMP_OFF, src)  # post-advance ip
    rem = jnp.where(take, ln, jnp.where(need, 0, rem))
    dist = jnp.where(take, d, dist)
    done = jnp.where(take, 0, done)
    err = err | (need & bad).astype(jnp.int32)

    # -- one piece of the current op --
    live = (err == 0) & (rem > 0)
    is_lit = dist == 0
    is_pat = (dist == 1) | (dist == 2) | (dist == 4)
    ds_ = jnp.maximum(dist, 1)
    dd = done - done % ds_ + ds_               # largest safe read-behind period
    lp = jnp.minimum(rem, PIECE_MAX)
    lp = jnp.where(is_lit | is_pat, lp, jnp.minimum(lp, dd))
    dstb = OUT_BASE + opc
    s = jnp.where(is_lit, src, dstb - jnp.where(is_pat, dist, dd))
    s = jnp.clip(s, COMP_OFF, OUT_BASE + BS - 1)

    u = _window(uni_ref, s, dstb)

    # pattern value (valid only when is_pat): the period bytes live in the
    # two lanes at the destination word frame; splat word-periodically
    # (decode_vm2._pattern math, executed unconditionally and selected)
    kd = (dstb >> 2) & 127
    db = dstb & 3
    lanes = _lanes()
    u0 = jnp.sum(jnp.where(lanes == kd, u, 0)).astype(jnp.uint32)
    u1 = jnp.sum(jnp.where(lanes == ((kd + 1) & 127), u, 0)).astype(jnp.uint32)
    shp = jnp.uint32(db * 8)
    v = jnp.where(db == 0, u0, (u0 >> shp) | (u1 << (jnp.uint32(32) - shp))).astype(jnp.int32)
    uv = v.astype(jnp.uint32)
    p1 = (v & 0xFF) * jnp.int32(0x01010101)
    base2 = (v & 0xFFFF) * jnp.int32(0x00010001)
    ub2 = base2.astype(jnp.uint32)
    p2 = jnp.where((db & 1) == 0, base2, ((ub2 >> 8) | (ub2 << 24)).astype(jnp.int32))
    p4 = jnp.where(db == 0, v, ((uv << shp) | (uv >> (jnp.uint32(32) - shp))).astype(jnp.int32))
    pat = jnp.where(dist == 1, p1, jnp.where(dist == 2, p2, p4))
    ufin = jnp.where(is_pat, jnp.zeros((1, 128), jnp.int32) + pat, u)

    _merge2_live(uni_ref, ufin, dstb, lp, live)

    adv = jnp.where(live, lp, 0)
    return (
        ip,
        opc + adv,
        err,
        rem - adv,
        dist,
        src + jnp.where(live & is_lit, lp, 0),
        done + jnp.where(live & ~is_lit, lp, 0),
    )


def _decode_kernel3(comp_lens_ref, out_lens_ref, *refs, K):
    smems = refs[:K]
    comp_v_ref = refs[K]
    out_ref = refs[K + 1]
    ok_ref = refs[K + 2]
    unis = refs[K + 3 : K + 3 + K]
    g = pl.program_id(0)

    cls = [comp_lens_ref[g * K + j] for j in range(K)]
    ols = [out_lens_ref[g * K + j] for j in range(K)]

    for j in range(K):
        unis[j][0:1, :] = jnp.zeros((1, 128), jnp.int32)
        unis[j][1 : 1 + COMP_ROWS, :] = comp_v_ref[j]
        unis[j][1 + COMP_ROWS : UROWS, :] = jnp.zeros(
            (UROWS - COMP_ROWS - 1, 128), jnp.int32
        )

    z = jnp.int32(0)
    init = (z,) * (7 * K)

    def split(st):
        return [st[7 * j : 7 * (j + 1)] for j in range(K)]

    def cond(st):
        alive = None
        for j, sj in enumerate(split(st)):
            ip, opc, err, rem = sj[0], sj[1], sj[2], sj[3]
            a = (err == 0) & ((rem > 0) | (ip < cls[j]))
            alive = a if alive is None else (alive | a)
        return alive

    def body(st):
        out = []
        for j, sj in enumerate(split(st)):
            out.extend(_step_block(smems[j], unis[j], cls[j], ols[j], sj))
        return tuple(out)

    final = lax.while_loop(cond, body, init)

    orow = OUT_BASE // 512
    for j, sj in enumerate(split(final)):
        ip, opc, err, rem = sj[0], sj[1], sj[2], sj[3]
        out_ref[j] = unis[j][orow : orow + OUT_ROWS, :]
        ok = ((err == 0) & (ip == cls[j]) & (opc == ols[j]) & (rem == 0)).astype(
            jnp.int32
        )
        ok_ref[j] = jnp.full((8, 128), ok, jnp.int32)


@functools.partial(jax.jit, static_argnames=("K",))
def decode_blocks_vm3(comp_u8: jnp.ndarray, comp_lens: jnp.ndarray, out_lens: jnp.ndarray,
                      K: int = K):
    """Batched block decode on the v3 interleaved VM: (B, PAD_OUT) uint8 +
    (B,) int32 x2 -> ((B, BS) uint8, (B,) bool).  Contract-identical to
    decode_vm2.decode_blocks_vm2 (0-length pad streams report ok); B is
    padded up to a multiple of K with empty blocks internally."""
    B = comp_u8.shape[0]
    Bp = ((B + K - 1) // K) * K
    comp_u8 = jnp.asarray(comp_u8)
    comp_lens = jnp.asarray(comp_lens, jnp.int32)
    out_lens = jnp.asarray(out_lens, jnp.int32)
    if Bp != B:
        comp_u8 = jnp.concatenate(
            [comp_u8, jnp.zeros((Bp - B, PAD_OUT), jnp.uint8)], axis=0
        )
        comp_lens = jnp.concatenate([comp_lens, jnp.zeros(Bp - B, jnp.int32)])
        out_lens = jnp.concatenate([out_lens, jnp.zeros(Bp - B, jnp.int32)])
    comp_w = _pack_words(comp_u8, CW)

    nG = Bp // K
    smem_specs = [
        pl.BlockSpec((CW,), functools.partial(lambda j, g, *_: (K * g + j,), j),
                     memory_space=pltpu.SMEM)
        for j in range(K)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nG,),
        in_specs=smem_specs + [
            pl.BlockSpec((K, COMP_ROWS, 128), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, OUT_ROWS, 128), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8, 128), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((UROWS, 128), jnp.int32) for _ in range(K)],
    )
    out_w, okm = pl.pallas_call(
        functools.partial(_decode_kernel3, K=K),
        out_shape=[
            jax.ShapeDtypeStruct((Bp, OUT_ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 8, 128), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(
        comp_lens,
        out_lens,
        *([comp_w.reshape(Bp * CW)] * K),
        comp_w.reshape(Bp, COMP_ROWS, 128),
    )
    out = _unpack_words(out_w.reshape(Bp, OUT_ROWS * 128))[:B]
    ok = okm[:B, 0, 0] == 1
    return out, ok
