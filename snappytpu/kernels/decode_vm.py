"""Pallas decode VM — a per-block sequential Snappy interpreter on the TPU.

Why a sequential kernel: this target's XLA random gathers/scatters run at
~10 ns/element (scalar-unit speed), so the v1 parallel decoder's pointer-
doubling rounds (decode_jax.py) cost seconds per batch.  A Pallas kernel
owning the whole block in VMEM pays NO per-element gather tax: op parsing is
scalar reads from SMEM, byte movement is vectorized 64-byte window copies
(dynamic row slices + lane rotations + funnel shifts), and the grid streams
one block per step with double-buffered VMEM I/O.  The strictly sequential
op walk makes every valid Snappy stream decodable — arbitrary back-reference
chain depth and self-overlapping copies (snappy_decompression.c:273-280
semantics) — with total work proportional to output bytes.

Constraints honored (probed on the real toolchain):
  * int8/uint8 VMEM refs do not compile -> everything is packed LE int32,
    4 bytes per lane; byte addressing is funnel shifts.
  * scalar stores to VMEM are rejected -> writes are full-row read-modify-
    write with byte masks.
  * dynamic slices must be lane-row granular -> rows of 128 words (512 B),
    pltpu.roll for in-row rotation (dynamic shift is supported).

Layouts per block (grid step): comp words both in SMEM (scalar parse) and
VMEM (vector payload reads); out is a (128, 128) int32 block = 64 KiB.

Validation: malformed streams (bad tag chains, zero/forward offsets, length
overruns) set a sticky error and the block is reported not-ok — the
reference's only plausibility check is dead code
(snappy_decompression.c:262); ours is deterministic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
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


import os as _os

# skip the second source-row read when a piece provably fits one row
_ONEROW = _os.environ.get("SNAPPYTPU_VM_ONEROW", "1") == "1"


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

    if lp is not None and _ONEROW:
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


def _n_interleave() -> int:
    """Blocks interpreted concurrently per grid program (scalar-latency
    ILP).  1 in interpret mode, where the concurrency only multiplies the
    per-iteration interpretation cost; overridable for tuning via
    SNAPPYTPU_VM_K."""
    if _interpret():
        return 1
    import os

    return int(os.environ.get("SNAPPYTPU_VM_K", "1"))


def _decode_kernel(comp_lens_ref, out_lens_ref, smem_ref, *refs, K):
    """Sequential interpreter over K blocks per grid program (K=1 default).

    Tuning notes from this target (v5e): the hot loop is VECTOR-ISSUE-
    THROUGHPUT bound, not scalar-latency bound — interleaving K=4 blocks
    behind pl.when guards measured ~1.2x SLOWER than K=1 (guard branches
    serialize), and a fully branchless variant issuing both piece kinds
    unconditionally measured ~2.6x slower (doubled vector work, still no
    overlap).  The lever that works is fewer vector ops per piece
    (_piece_copy).  Blocks use separate refs so K>1 stays available for
    experiments via SNAPPYTPU_VM_K."""
    g = pl.program_id(0)
    compv_refs = refs[:K]
    out_refs = refs[K : 2 * K]
    ok_ref = refs[2 * K]

    for k in range(K):
        out_refs[k][...] = jnp.zeros((1, OUT_ROWS, 128), jnp.int32)

    def step(k, ip, op, err, comp_len, out_len):
        """One op of block k; returns (ip2, op2, err2)."""
        compv_ref = compv_refs[k]
        out_ref = out_refs[k]
        alive = (ip < comp_len) & (op < out_len) & (err == 0)
        base = k * CW
        # ---- operand decode: two word reads + funnel give bytes ip..ip+4 ----
        wi = ip >> 2
        sh = (ip & 3) * 8
        w0 = smem_ref[base + wi]
        w1 = smem_ref[base + jnp.minimum(wi + 1, CW - 1)]
        u0 = jnp.uint32(w0.astype(jnp.uint32))
        u1 = jnp.uint32(w1.astype(jnp.uint32))
        v = jnp.where(sh == 0, u0, (u0 >> jnp.uint32(sh)) | (u1 << jnp.uint32((32 - sh) % 32))).astype(jnp.int32)
        tag = v & 0xFF
        b1 = (v >> 8) & 0xFF
        b2 = (v >> 16) & 0xFF
        b3 = jax.lax.shift_right_logical(v, 24) & 0xFF
        b4 = jax.lax.shift_right_logical(w1, sh) & 0xFF

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
        dist = jnp.where(
            kind == C.TAG_COPY1,
            ((code >> 3) << 8) | b1,
            jnp.where(kind == C.TAG_COPY2, b1 | (b2 << 8), b1 | (b2 << 8) | (b3 << 16)),
        )
        ln = jnp.where(is_lit, lit_len, cp_len)

        bad = (ip + hdr > comp_len) | (op + ln > out_len)
        bad = bad | (is_lit & (ip + hdr + ln > comp_len))
        bad = bad | (~is_lit & ((dist < 1) | (dist > op)))
        # COPY4 offsets above 24 bits cannot be valid in a <=64 KiB block
        bad = bad | ((kind == C.TAG_COPY4) & (b4 != 0))
        # 5-byte literal lengths with bits 30-31 set cannot be valid either:
        # the masked arithmetic above would silently reinterpret them
        bad = bad | (is_lit & (extra == 4) & ((b4 & 0xC0) != 0))

        # ---- byte movement (vector pieces; one branch per op).  The VM is
        # vector-issue-throughput-bound (a branchless variant issuing both
        # piece kinds unconditionally measured 2.6x SLOWER), so the guards
        # stay and the optimization levers are vector ops per piece and
        # loop overhead: the overwhelmingly common single-piece case is
        # hoisted out of the remainder while_loops. ----
        @pl.when(alive & is_lit & ~bad)
        def _():
            # literals stream in up to 504-byte pieces (one row-pair window)
            lp1 = jnp.minimum(ln, 504)
            _piece_copy(compv_ref, COMP_ROWS, out_ref, ip + hdr, op, lp1, bi=0)

            @pl.when(ln > 504)
            def _():
                def lc(done):
                    return done < ln

                def lb(done):
                    lp = jnp.minimum(ln - done, 504)
                    _piece_copy(compv_ref, COMP_ROWS, out_ref, ip + hdr + done,
                                op + done, lp, bi=0)
                    return done + lp

                lax.while_loop(lc, lb, jnp.int32(504))

        @pl.when(alive & ~is_lit & ~bad)
        def _():
            pat_ok = ((dist == 1) | (dist == 2) | (dist == 4)) & (dist < ln)

            # word-periodic overlap (the run-length shape): one merge
            @pl.when(pat_ok)
            def _():
                _pattern_copy(out_ref, op, ln, dist, bi=0)

            # general copies; may self-overlap (dist < len): read at the
            # largest period multiple that keeps the window behind the write
            # cursor — piece sizes grow like dist, 2*dist, 4*dist... so
            # replication finishes in O(log(len/dist)) pieces (the
            # byte-forward semantics of snappy_decompression.c:273-280 in
            # vector chunks).  Non-overlapping copies (dist >= len, the
            # common case) finish in the hoisted first piece.
            @pl.when(~pat_ok)
            def _():
                lp1 = jnp.minimum(jnp.minimum(ln, 64), dist)
                _piece_copy(out_ref, OUT_ROWS, out_ref, op - dist, op, lp1, bi=0)

                @pl.when(lp1 < ln)
                def _():
                    def cc(done):
                        return done < ln

                    def cb(done):
                        m = done // dist + 1
                        dd = m * dist
                        lp = jnp.minimum(jnp.minimum(ln - done, 64), dd)
                        _piece_copy(out_ref, OUT_ROWS, out_ref, op + done - dd,
                                    op + done, lp, bi=0)
                        return done + lp

                    lax.while_loop(cc, cb, lp1)

        ip2 = jnp.where(alive, ip + hdr + jnp.where(is_lit, ln, 0), ip)
        op2 = jnp.where(alive, op + ln, op)
        err2 = jnp.where(alive, err | bad.astype(jnp.int32), err)
        return ip2, op2, err2

    comp_lens = [comp_lens_ref[g * K + k] for k in range(K)]
    out_lens = [out_lens_ref[g * K + k] for k in range(K)]

    def cond(st):
        ips, ops, errs = st
        alive = False
        for k in range(K):
            alive = alive | (
                (ips[k] < comp_lens[k]) & (ops[k] < out_lens[k]) & (errs[k] == 0)
            )
        return alive

    def body(st):
        ips, ops, errs = st
        nips, nops, nerrs = [], [], []
        for k in range(K):
            i2, o2, e2 = step(k, ips[k], ops[k], errs[k], comp_lens[k], out_lens[k])
            # second op per iteration: halves the outer-loop condition and
            # branch overhead; step() self-guards when the block finished
            i2, o2, e2 = step(k, i2, o2, e2, comp_lens[k], out_lens[k])
            nips.append(i2)
            nops.append(o2)
            nerrs.append(e2)
        return tuple(nips), tuple(nops), tuple(nerrs)

    zeros = tuple(jnp.int32(0) for _ in range(K))
    ips, ops, errs = lax.while_loop(cond, body, (zeros, zeros, zeros))

    for k in range(K):
        ok = (
            (errs[k] == 0) & (ips[k] == comp_lens[k]) & (ops[k] == out_lens[k])
        ).astype(jnp.int32)
        ok_ref[k, :, :] = jnp.full((8, 128), ok, jnp.int32)


def _pack_words(u8: jnp.ndarray, ncols: int) -> jnp.ndarray:
    """(B, 4*ncols) uint8 -> (B, ncols) int32 LE."""
    b = u8.reshape(u8.shape[0], ncols, 4).astype(jnp.uint32)
    w = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    return w.astype(jnp.int32)


def _unpack_words(w: jnp.ndarray) -> jnp.ndarray:
    """(B, n) int32 LE -> (B, 4n) uint8."""
    u = w.astype(jnp.uint32)
    parts = jnp.stack(
        [(u >> jnp.uint32(8 * k)) & 0xFF for k in range(4)], axis=-1
    ).astype(jnp.uint8)
    return parts.reshape(w.shape[0], w.shape[1] * 4)


def decode_blocks_vm(comp_u8, comp_lens, out_lens):
    """Batched block decode on the Pallas VM: (B, PAD_OUT) uint8 + (B,) int32
    x2 -> ((B, BS) uint8, (B,) bool).  Dispatches to the v2
    tokenize/movement VM (decode_vm2.py, default) or the v1 interleaved VM
    below (SNAPPYTPU_VM=1), which is kept for A/B measurement."""
    if _os.environ.get("SNAPPYTPU_VM", "2") != "1":
        from .decode_vm2 import decode_blocks_vm2

        return decode_blocks_vm2(comp_u8, comp_lens, out_lens)
    return _decode_blocks_vm_v1(comp_u8, comp_lens, out_lens)


@jax.jit
def _decode_blocks_vm_v1(comp_u8: jnp.ndarray, comp_lens: jnp.ndarray, out_lens: jnp.ndarray):
    """v1 interleaved parse/move VM.  Blocks are decoded K per grid program;
    ragged batches are padded with empty blocks (0-length streams finish
    immediately and report ok, the pad rows are dropped here)."""
    B = comp_u8.shape[0]
    K = _n_interleave()
    BP = ((B + K - 1) // K) * K
    comp_w = _pack_words(jnp.asarray(comp_u8), CW)
    comp_lens = jnp.asarray(comp_lens, jnp.int32)
    out_lens = jnp.asarray(out_lens, jnp.int32)
    if BP != B:
        comp_w = jnp.concatenate(
            [comp_w, jnp.zeros((BP - B, CW), jnp.int32)], axis=0
        )
        comp_lens = jnp.concatenate([comp_lens, jnp.zeros(BP - B, jnp.int32)])
        out_lens = jnp.concatenate([out_lens, jnp.zeros(BP - B, jnp.int32)])

    # per-block deinterleaved VMEM views: block g*K+k lives in array k at
    # row g, so each interleaved block gets its OWN pallas ref (the
    # no-alias guarantee the branchless kernel relies on)
    comp_dei = comp_w.reshape(BP // K, K, COMP_ROWS, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BP // K,),
        in_specs=[
            pl.BlockSpec((K * CW,), lambda g, *_: (g,), memory_space=pltpu.SMEM),
        ]
        + [
            pl.BlockSpec((1, COMP_ROWS, 128), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(K)
        ],
        out_specs=[
            pl.BlockSpec((1, OUT_ROWS, 128), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(K)
        ]
        + [pl.BlockSpec((K, 8, 128), lambda g, *_: (g, 0, 0), memory_space=pltpu.VMEM)],
    )
    results = pl.pallas_call(
        functools.partial(_decode_kernel, K=K),
        out_shape=[
            jax.ShapeDtypeStruct((BP // K, OUT_ROWS, 128), jnp.int32)
            for _ in range(K)
        ]
        + [jax.ShapeDtypeStruct((BP, 8, 128), jnp.int32)],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(
        comp_lens,
        out_lens,
        comp_w.reshape(BP * CW),
        *[comp_dei[:, k] for k in range(K)],
    )
    out_parts, okm = results[:K], results[K]
    out_w = jnp.stack(out_parts, axis=1).reshape(BP, OUT_ROWS, 128)
    out = _unpack_words(out_w[:B].reshape(B, OUT_ROWS * 128))
    ok = okm[:B, 0, 0] == 1
    return out, ok
