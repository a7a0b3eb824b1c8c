"""Decode dispatch + the shared funnel-window copy primitives.

The production batched block decoder is decode_blocks_vm below, which
dispatches to the v4 software-pipelined VM (decode_vm4.py).  This module
also owns the funnel-window copy helpers (_aligned_window, _merge_window,
_piece_copy, _pattern_copy) shared with the encoder's funnel concat
kernel (concat.py).

History: the v1 interleaved parse/move VM lived here through round 3; it
was superseded by decode_vm2's unified-image interpreter and retired in
round 4 once v2/v4 held its whole test surface (VERDICT r3 #6).  The
probed layout constraints it established still govern every kernel in
this package:
  * int8/uint8 VMEM refs do not compile -> everything is packed LE int32,
    4 bytes per lane; byte addressing is funnel shifts.
  * scalar stores to VMEM are rejected -> writes are full-row read-modify-
    write with byte masks.
  * dynamic slices must be lane-row granular -> rows of 128 words (512 B),
    pltpu.roll for in-row rotation (dynamic shift is supported).

Validation contract (all VMs): malformed streams (bad tag chains,
zero/forward offsets, length overruns) set a sticky error and the block
is reported not-ok — the reference's only plausibility check is dead
code (snappy_decompression.c:262); ours is deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format import constants as C

BS = C.MAX_BLOCK_SIZE                      # 65536 output bytes / block
PAD_OUT = C.MAX_COMPRESSED_BLOCK_SIZE      # 73728 comp bytes / block
CW = PAD_OUT // 4                          # 18432 comp words = 144 rows
OUT_ROWS = BS // 512                       # 128 out rows of 128 words
COMP_ROWS = CW // 128                      # 144


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _byte_at(smem, i):
    """Scalar byte read from LE-packed words in SMEM."""
    return (smem[i >> 2] >> ((i & 3) * 8)) & 0xFF


def _lanes():
    return lax.broadcasted_iota(jnp.int32, (1, 128), 1)


def _aligned_window(src_ref, src_rows, src, dst, bi=0, lp=None):
    """Source bytes starting at src, lane-rotated and byte-funneled into the
    destination frame: returns u with u[lane kd+t] = dest word dw+t (valid
    for the bytes covered by the source rows read).

    The funnel is FORWARD-ONLY: the virtual source start vs = src - (dst&3)
    phase-aligns source and dest, so dest word dw+t is always
    (W[ws+t] >> sh) | (W[ws+t+1] << 32-sh) — no backward path, no direction
    select.  vs can go negative only when src < dst&3 (<= 3); then ws
    floors to -1, the clamped row read yields garbage in W[-1], and every
    byte it contributes lands below dst&3 in the first dest word — always
    masked out by the merge.

    When lp (the piece length) is given and the needed source words plus the
    funnel neighbor all sit in one 512 B row — the overwhelmingly common
    case for <=64 B ops — the second row read and the splice select are
    skipped behind one scalar branch."""
    db = dst & 3
    vs = src - db                          # phase-aligned virtual start
    ws = vs >> 2                           # floor division (may be -1)
    srow = ws >> 7
    k = ws & 127
    sh = jnp.uint32((vs & 3) * 8)
    kd = (dst >> 2) & 127

    a = src_ref[bi, pl.ds(jnp.maximum(srow, 0), 1), :].reshape(1, 128)
    lanes = _lanes()

    # rotate source rows directly into the destination lane frame: the word
    # ws+t lands at lane (kd+t) mod 128
    rot = (kd - k) & 127
    pa = pltpu.roll(a, rot, 1)
    jm = (lanes - kd) & 127                # t: source word offset per lane

    if lp is not None:
        # one row covers words ws .. ws+nw (incl. the funnel's +1 neighbor)?
        one_row = (srow >= 0) & (k + ((db + lp - 1) >> 2) + 1 <= 127)

        def splice(_):
            b = src_ref[bi, pl.ds(jnp.minimum(srow + 1, src_rows - 1), 1), :].reshape(1, 128)
            pb = pltpu.roll(b, rot, 1)
            return jnp.where(jm < 128 - k, pa, pb)

        w = lax.cond(one_row, lambda _: pa, splice, 0)
    else:
        b = src_ref[bi, pl.ds(jnp.minimum(srow + 1, src_rows - 1), 1), :].reshape(1, 128)
        pb = pltpu.roll(b, rot, 1)
        w = jnp.where(jm < 128 - k, pa, pb)    # w[lane kd+t] = word ws+t

    wn = pltpu.roll(w, 127, 1)             # word ws+t+1
    uw = w.astype(jnp.uint32)
    un = wn.astype(jnp.uint32)
    return jnp.where(
        sh == 0, w, ((uw >> sh) | (un << (jnp.uint32(32) - sh))).astype(jnp.int32)
    )                                       # u[lane kd+t] = dest word dw+t


def _merge_window(out_ref, u, dst, lp, bi=0, out_rows=None):
    """Merge the aligned window u into [dst, dst+lp) of the packed out block
    under a byte mask; never touches bytes outside the range."""
    if out_rows is None:
        out_rows = OUT_ROWS
    dw = dst >> 2
    dw_end = (dst + lp + 3) >> 2           # exclusive
    rowd = dw >> 7
    db = dst & 3
    lanes = _lanes()

    esh = (dst + lp) & 3
    mask_first = (jnp.uint32(0xFFFFFFFF) << jnp.uint32(db * 8)).astype(jnp.int32)
    mask_last = jnp.where(
        esh == 0, jnp.int32(-1), ((jnp.uint32(1) << jnp.uint32(esh * 8)) - 1).astype(jnp.int32)
    )

    def merge_row(r):
        widx = r * 128 + lanes             # global word index per lane
        inside = (widx >= dw) & (widx < dw_end)
        m = jnp.where(inside, jnp.int32(-1), 0)
        m = jnp.where(widx == dw, m & mask_first, m)
        m = jnp.where(widx == dw_end - 1, m & mask_last, m)
        d0 = out_ref[bi, pl.ds(r, 1), :].reshape(1, 128)
        out_ref[bi, pl.ds(r, 1), :] = ((u & m) | (d0 & ~m)).reshape(1, 128)

    merge_row(rowd)

    @pl.when(((dw_end - 1) >> 7) != rowd)
    def _():
        merge_row(jnp.minimum(rowd + 1, out_rows - 1))


def _piece_copy(src_ref, src_rows, out_ref, src, dst, lp, bi=0, out_rows=None):
    """Copy lp (1..504) bytes from packed buffer src_ref[bi, @src] to the
    packed out block [bi, @dst].  One fused vector chain: the two source rows
    are lane-rotated straight to the destination lane frame, spliced, byte-
    funneled by the net phase difference, and merged into the destination
    rows under a byte mask; never touches bytes outside [dst, dst+lp)."""
    u = _aligned_window(src_ref, src_rows, src, dst, bi=bi, lp=lp)
    _merge_window(out_ref, u, dst, lp, bi=bi, out_rows=out_rows)


def _pattern_copy(out_ref, dst, lp, dist, bi=0):
    """Self-overlapping copy with dist in {1, 2, 4}: the replicated pattern
    has period dividing the word size, so EVERY destination word holds the
    same value — build it once from the period bytes out[dst-dist, dst) and
    fill [dst, dst+lp) in one merge instead of O(log(lp/dist)) doubling
    pieces (run-heavy data decodes ~7x fewer vector chains)."""
    u = _aligned_window(out_ref, OUT_ROWS, dst - dist, dst, bi=bi)
    kd = (dst >> 2) & 127
    db = dst & 3
    lanes = _lanes()
    # v = out[dst-dist .. dst-dist+4) — only the first `dist` bytes are
    # guaranteed written, which is exactly one period
    u0 = jnp.sum(jnp.where(lanes == kd, u, 0)).astype(jnp.uint32)
    u1 = jnp.sum(jnp.where(lanes == ((kd + 1) & 127), u, 0)).astype(jnp.uint32)
    sh = jnp.uint32(db * 8)
    v = jnp.where(db == 0, u0, (u0 >> sh) | (u1 << (jnp.uint32(32) - sh))).astype(jnp.int32)
    uv = v.astype(jnp.uint32)
    # destination word dw's byte j must hold pattern[(j - db) mod dist]
    p1 = (v & 0xFF) * jnp.int32(0x01010101)
    base2 = (v & 0xFFFF) * jnp.int32(0x00010001)
    ub2 = base2.astype(jnp.uint32)
    p2 = jnp.where((db & 1) == 0, base2, ((ub2 >> 8) | (ub2 << 24)).astype(jnp.int32))
    p4 = jnp.where(db == 0, v, ((uv << sh) | (uv >> (jnp.uint32(32) - sh))).astype(jnp.int32))
    pat = jnp.where(dist == 1, p1, jnp.where(dist == 2, p2, p4))
    _merge_window(out_ref, jnp.zeros((1, 128), jnp.int32) + pat, dst, lp, bi=bi)


def _pack_words(u8: jnp.ndarray, ncols: int) -> jnp.ndarray:
    """(B, 4*ncols) uint8 -> (B, ncols) int32 LE."""
    # bitcast, not shift-assemble: a (.., ncols, 4) uint32 intermediate
    # pads its minor dim to 128 lanes on this target (32x HBM inflation)
    return lax.bitcast_convert_type(
        u8.reshape(u8.shape[0], ncols, 4), jnp.int32
    )


def _unpack_words(w: jnp.ndarray) -> jnp.ndarray:
    """(B, n) int32 LE -> (B, 4n) uint8."""
    # bitcast for the same padded-intermediate reason as _pack_words
    return lax.bitcast_convert_type(w, jnp.uint8).reshape(
        w.shape[0], w.shape[1] * 4
    )


def decode_blocks_vm(comp_u8, comp_lens, out_lens):
    """Batched block decode on the production Pallas VM: (B, PAD_OUT) uint8
    + (B,) int32 x2 -> ((B, BS) uint8, (B,) bool).  Dispatches to the v4
    software-pipelined VM (decode_vm4.py); decode_vm2 remains importable
    for A/B and serves the windowed stream decoder."""
    from .decode_vm4 import decode_blocks_vm4

    return decode_blocks_vm4(comp_u8, comp_lens, out_lens)
