"""Pallas decode VM v4 — software-pipelined piece interpreter.

Measured on this target (tools/probe_scalar.py, tools/dec_anatomy.py):
every dependent step — scalar ALU, SMEM load, vector op, dynamic-address
row access — has ~110 ns of result latency, while INDEPENDENT work
overlaps almost perfectly.  The v2 VM's per-piece critical path chains
two such latencies: the parse dataflow (ip -> SMEM words -> lengths ->
ip'), ~94 ns/op alone, feeds the piece's window/merge ADDRESSES, whose
scalar->vector-memory handoff is another ~110 ns — measured 207 ns/op
full vs 100 ns/op when the addresses are compile-time constants.

v4 breaks that chain with a D-deep software pipeline INSIDE the loop:
each iteration (a) parses/schedules piece i (pure scalar, touches only
the SMEM words), pushing a 5-scalar record into a register delay queue,
and (b) executes the MOVEMENT of piece i-D popped from the queue.  The
movement addresses were computed D iterations ago, so their handoff
latency overlaps the scheduler's parse chain instead of adding to it;
program order of the movements is unchanged, so the memory dependences
between overlapping copies are preserved exactly.

Piece semantics (unified image, funnel window, masked 2-row merge,
period-multiple self-overlap schedule, dist-{1,2,4} pattern fill,
copy-chain coalescing) are decode_vm2's, byte for byte, and the accept
set is identical (fuzz-differential tested).  A larger interleave was
tried first and rejected: 6 whole-VM states exceed the register budget
and the scheduler serializes the chains (the r3 decode_vm3 experiment,
retired in r5 after the tape probes re-confirmed its conclusion at the
hardware level; its branchless _parse_at lives on below).

Reference behavior reimplemented here: the tag dispatch and byte-forward
overlapping copy of snappy_decompression.c:290-333/:273-280 with
deterministic validation replacing the dead check at :262.
"""

from __future__ import annotations

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
    _pack_words,
    _pattern,
    _piece,
    _unpack_words,
)

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


D = 2  # pipeline depth: movement of piece i runs alongside parse of i+D


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _move(uni_ref, rec):
    """Execute one queued movement record (s, d, lp, patk, live).

    Measured A/B (PROFILE.md r4): this branched form beats a branchless
    masked-merge variant on runs (296 vs 256 MB/s) and random (355 vs
    288) and ties it on mixed/text — the delayed records make the
    branch conditions available early, and skipping the whole funnel on
    dead/pattern records is worth more than basic-block continuity."""
    s, dd, lp, patk, live = rec

    @pl.when((live == 1) & (patk == 0))
    def _():
        _piece(uni_ref, s, dd, lp)

    @pl.when((live == 1) & (patk > 0))
    def _():
        _pattern(uni_ref, dd, lp, patk)


def _block_loop_pipelined(smem_ref, uni_ref, comp_len, out_len, out_base):
    """Sequential piece interpreter with a D-deep parse->movement pipeline.
    Returns the final (ip, opc, err, rem) scheduler state after draining."""

    znr = (jnp.int32(0),) * 5  # empty queue record (live == 0)

    def step(st):
        (ip, opc, err, rem, dist, src, done), q = st[0], st[1]

        # ---- schedule: branchless parse when the current op is exhausted,
        # with v2's same-distance chain coalescing ----
        hdr, ln, d, bad = _parse_at(smem_ref, ip, opc, comp_len, out_len)
        is_lit_p = d == 0

        def absorb(a):
            ip_a, rem_a, _ = a
            h2, l2, d2, bad2 = _parse_at(smem_ref, ip_a, opc + rem_a,
                                         comp_len, out_len)
            cont = (ip_a < comp_len) & ~bad2 & (d2 == d)
            return (
                jnp.where(cont, ip_a + h2, ip_a),
                jnp.where(cont, rem_a + l2, rem_a),
                cont,
            )

        chainable = ~is_lit_p & ~bad & (
            (d == 1) | (d == 2) | (d == 4) | (ln == C.MAX_COPY_LEN)
        )
        ip_l = ip + hdr + jnp.where(is_lit_p, ln, 0)
        ip_c, rem_c, _ = lax.while_loop(
            lambda a: a[2], absorb, (ip + hdr, ln, chainable)
        )

        need = (err == 0) & (rem == 0) & (ip < comp_len)
        take = need & ~bad
        nip = jnp.where(take, jnp.where(is_lit_p, ip_l, ip_c), ip)
        src = jnp.where(take & is_lit_p, ip + hdr + COMP_OFF, src)
        rem = jnp.where(take, jnp.where(is_lit_p, ln, rem_c),
                        jnp.where(need, 0, rem))
        dist = jnp.where(take, d, dist)
        done = jnp.where(take, 0, done)
        err = err | (need & bad).astype(jnp.int32)
        ip = nip

        # ---- cut one piece of the current op into a record ----
        live = (err == 0) & (rem > 0)
        is_lit = dist == 0
        is_pat = (dist == 1) | (dist == 2) | (dist == 4)
        ds_ = jnp.maximum(dist, 1)
        dd_ = done - done % ds_ + ds_
        lp = jnp.minimum(rem, PIECE_MAX)
        lp = jnp.where(is_lit | is_pat, lp, jnp.minimum(lp, dd_))
        dstb = out_base + opc
        s = jnp.where(is_lit, src, dstb - dd_)
        patk = jnp.where(is_pat & ~is_lit, dist, 0)
        rec = (s, dstb, lp, patk, live.astype(jnp.int32))

        adv = jnp.where(live, lp, 0)
        opc = opc + adv
        rem = rem - adv
        src = src + jnp.where(live & is_lit, lp, 0)
        done = done + jnp.where(live & ~is_lit, lp, 0)

        # ---- execute the movement scheduled D iterations ago ----
        _move(uni_ref, q[0])
        q = q[1:] + (rec,)

        return ((ip, opc, err, rem, dist, src, done), q)

    def loop_cond(st):
        ip, opc, err, rem = st[0][0], st[0][1], st[0][2], st[0][3]
        return (err == 0) & (opc < out_len) & ((rem > 0) | (ip < comp_len))

    def loop_body(st):
        return step(step(st))

    z = jnp.int32(0)
    st = lax.while_loop(
        loop_cond, loop_body, ((z, z, z, z, z, z, z), (znr,) * D)
    )
    # drain: the last D scheduled movements are still queued
    for k in range(D):
        _move(uni_ref, st[1][k])
    ip, opc, err, rem = st[0][0], st[0][1], st[0][2], st[0][3]
    return ip, opc, err, rem


def _decode_kernel4(comp_lens_ref, out_lens_ref, smem_ref, comp_v_ref,
                    out_ref, ok_ref, uni_ref):
    g = pl.program_id(0)
    comp_len = comp_lens_ref[g]
    out_len = out_lens_ref[g]

    uni_ref[0:1, :] = jnp.zeros((1, 128), jnp.int32)
    uni_ref[1 : 1 + COMP_ROWS, :] = comp_v_ref[0]
    uni_ref[1 + COMP_ROWS : UROWS, :] = jnp.zeros(
        (UROWS - COMP_ROWS - 1, 128), jnp.int32
    )

    ip, opc, err, rem = _block_loop_pipelined(
        smem_ref, uni_ref, comp_len, out_len, OUT_BASE
    )

    orow = OUT_BASE // 512
    out_ref[0] = uni_ref[orow : orow + OUT_ROWS, :]
    ok = ((err == 0) & (ip == comp_len) & (opc == out_len) & (rem == 0)).astype(
        jnp.int32
    )
    ok_ref[0] = jnp.full((8, 128), ok, jnp.int32)


@jax.jit
def decode_blocks_vm4(comp_u8: jnp.ndarray, comp_lens: jnp.ndarray, out_lens: jnp.ndarray):
    """Batched block decode on the v4 pipelined VM: (B, PAD_OUT) uint8 +
    (B,) int32 x2 -> ((B, BS) uint8, (B,) bool).  Contract-identical to
    decode_vm2.decode_blocks_vm2 (0-length pad streams report ok)."""
    B = comp_u8.shape[0]
    comp_w = _pack_words(jnp.asarray(comp_u8), CW)
    comp_lens = jnp.asarray(comp_lens, jnp.int32)
    out_lens = jnp.asarray(out_lens, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
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
        scratch_shapes=[
            pltpu.VMEM((UROWS, 128), jnp.int32),
        ],
    )
    out_w, okm = pl.pallas_call(
        _decode_kernel4,
        out_shape=[
            jax.ShapeDtypeStruct((B, OUT_ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(
        comp_lens,
        out_lens,
        comp_w.reshape(B * CW),
        comp_w.reshape(B, COMP_ROWS, 128),
    )
    out = _unpack_words(out_w.reshape(B, OUT_ROWS * 128))
    ok = okm[:, 0, 0] == 1
    return out, ok
