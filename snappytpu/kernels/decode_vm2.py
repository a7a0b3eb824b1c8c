"""Pallas decode VM v2 — unified-image piece interpreter.

The v1 VM (decode_vm.py) interleaves op parsing and byte movement with
separate code paths per op kind, measuring ~180-260 ns/op (PROFILE.md) —
op-count bound on text.  v2 keeps the sequential walk but restructures
the work per op:

  unified image   one VMEM scratch holds a guard row, the compressed
                  block, and the output side by side, so literal pieces
                  (comp->out) and copy pieces (out->out) share ONE
                  funnel-window code path, and every piece is a single
                  (2, 128)-row read plus a single (2, 128)-row masked
                  read-modify-write (a piece spans at most two rows).
  coalescing      consecutive same-distance copies — the 60/64-chunked
                  tail of every long match (snappy_compression.c:153-165)
                  and run-length streams — are absorbed at parse time
                  into one logical copy, so movement executes
                  ceil(L/504) pieces instead of one per wire op.
  pattern fill    self-overlap with dist in {1,2,4} writes any length in
                  one merge (word-periodic splat); other overlapping
                  distances use period-multiple doubling pieces — the
                  byte-forward semantics of snappy_decompression.c:273-280
                  in vector chunks.

All validity checks run at parse time (the reference's only plausibility
check is dead code, snappy_decompression.c:262; ours is deterministic and
matches the v1/model/C++ accept set exactly — fuzz-differential tested).

A second kernel (decode_stream_vm) chains chunks sequentially with a
sliding 64 KiB context window for valid streams whose ops straddle block
boundaries — the device analog of the reference's source-window refill
(snappy_decompression.c:154-161).

Layout constraints carried over from v1 (probed on the real toolchain):
int8 VMEM refs do not compile -> packed LE int32 words; scalar VMEM stores
are rejected -> masked row RMW; dynamic slices are lane-row granular.
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
CW = PAD_OUT // 4                          # 18432 comp words
COMP_ROWS = CW // 128                      # 144 rows of 512 B
OUT_ROWS = BS // 512                       # 128
# one guard row before the comp region keeps every window source address
# >= 512, so the funnel's virtual start never floors below row 0 and the
# row-pair read needs no clamp select (see _window)
COMP_OFF = 512
OUT_BASE = COMP_OFF + COMP_ROWS * 512      # byte address of output in `uni`
UROWS = 288                                # guard + 144 comp + 128 out + pad
PIECE_MAX = 504                            # max piece bytes (2-row window)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _lanes():
    return lax.broadcasted_iota(jnp.int32, (1, 128), 1)


def _lanes2():
    return lax.broadcasted_iota(jnp.int32, (2, 128), 1)


def _rows2():
    return lax.broadcasted_iota(jnp.int32, (2, 128), 0)


def _window(uni_ref, src, dst):
    """Aligned source window: returns u (1, 128) with u[lane (dw+t)&127] =
    dest word dw+t, valid for the 128 dest words starting at dw = dst>>2.

    One (2, 128) row-pair read; the pair is lane-rotated into the
    destination frame, spliced at the row seam, and byte-funneled by the
    net phase difference.  The funnel is forward-only: the virtual source
    start vs = src - (dst&3) phase-aligns source and dest.  Callers keep
    src >= COMP_OFF (the guard row), so vs >= 509 and the row pair needs
    no clamping."""
    db = dst & 3
    vs = src - db
    ws = vs >> 2
    srow = ws >> 7
    k = ws & 127
    sh = jnp.uint32((vs & 3) * 8)
    kd = (dst >> 2) & 127

    pair = uni_ref[pl.ds(srow, 2), :]      # (2, 128)
    rot = (kd - k) & 127
    pr = pltpu.roll(pair, rot, 1)
    jm = (_lanes() - kd) & 127             # t: source word offset per lane
    w = jnp.where(jm < 128 - k, pr[0:1, :], pr[1:2, :])  # w[lane kd+t] = word ws+t
    wn = pltpu.roll(w, 127, 1)             # word ws+t+1
    uw = w.astype(jnp.uint32)
    un = wn.astype(jnp.uint32)
    return jnp.where(
        sh == 0, w, ((uw >> sh) | (un << (jnp.uint32(32) - sh))).astype(jnp.int32)
    )


def _merge2(uni_ref, u, dst, lp):
    """Merge u into bytes [dst, dst+lp) of the unified image with ONE
    (2, 128) read-modify-write (a piece spans at most two rows); never
    touches bytes outside the range."""
    dw = dst >> 2
    dw_end = (dst + lp + 3) >> 2           # exclusive
    rowd = dw >> 7
    db = dst & 3
    esh = (dst + lp) & 3
    mask_first = (jnp.uint32(0xFFFFFFFF) << jnp.uint32(db * 8)).astype(jnp.int32)
    mask_last = jnp.where(
        esh == 0, jnp.int32(-1), ((jnp.uint32(1) << jnp.uint32(esh * 8)) - 1).astype(jnp.int32)
    )

    widx = (rowd + _rows2()) * 128 + _lanes2()
    inside = (widx >= dw) & (widx < dw_end)
    m = jnp.where(inside, jnp.int32(-1), 0)
    m = jnp.where(widx == dw, m & mask_first, m)
    m = jnp.where(widx == dw_end - 1, m & mask_last, m)
    u2 = jnp.broadcast_to(u, (2, 128))
    d0 = uni_ref[pl.ds(rowd, 2), :]
    uni_ref[pl.ds(rowd, 2), :] = (u2 & m) | (d0 & ~m)


def _piece(uni_ref, src, dst, lp):
    """Copy lp (1..504) bytes from byte address src to byte address dst of
    the unified image (comp or out region; regions may self-overlap with
    src + lp <= dst, guaranteed by the tokenizer's period-multiple
    schedule)."""
    u = _window(uni_ref, src, dst)
    _merge2(uni_ref, u, dst, lp)


def _pattern(uni_ref, dst, lp, dist):
    """Self-overlapping fill with dist in {1, 2, 4}: the period divides the
    word size, so every destination word holds the same value — build it
    from the period bytes out[dst-dist, dst) and fill [dst, dst+lp) in one
    merge (decode_vm.py:170-194 semantics)."""
    u = _window(uni_ref, dst - dist, dst)
    kd = (dst >> 2) & 127
    db = dst & 3
    lanes = _lanes()
    u0 = jnp.sum(jnp.where(lanes == kd, u, 0)).astype(jnp.uint32)
    u1 = jnp.sum(jnp.where(lanes == ((kd + 1) & 127), u, 0)).astype(jnp.uint32)
    sh = jnp.uint32(db * 8)
    v = jnp.where(db == 0, u0, (u0 >> sh) | (u1 << (jnp.uint32(32) - sh))).astype(jnp.int32)
    uv = v.astype(jnp.uint32)
    p1 = (v & 0xFF) * jnp.int32(0x01010101)
    base2 = (v & 0xFFFF) * jnp.int32(0x00010001)
    ub2 = base2.astype(jnp.uint32)
    p2 = jnp.where((db & 1) == 0, base2, ((ub2 >> 8) | (ub2 << 24)).astype(jnp.int32))
    p4 = jnp.where(db == 0, v, ((uv << sh) | (uv >> (jnp.uint32(32) - sh))).astype(jnp.int32))
    pat = jnp.where(dist == 1, p1, jnp.where(dist == 2, p2, p4))
    _merge2(uni_ref, jnp.zeros((1, 128), jnp.int32) + pat, dst, lp)


def _block_loop(smem_ref, uni_ref, comp_len, out_len, ctx_len, out_base):
    """The sequential piece interpreter for one chunk: parses ops from the
    SMEM comp words and moves bytes within the unified VMEM image whose
    output region starts at byte `out_base`.  ctx_len is how many decoded
    bytes sit immediately BEFORE out_base (the sliding window of the
    stream decoder, snappy_decompression.c:154-161; 0 for independent
    blocks).  Returns the final (ip, opc, err, rem) state."""

    def parse_at(ip, opc_eff):
        """Decode the op at comp byte ip with the output cursor at opc_eff.
        Returns (hdr, ln, dist [0 => literal], bad).  Identical accept set
        to decode_vm.py:233-289 (validated by the fuzz differentials)."""
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
        bad = bad | (~is_lit & ((d < 1) | (d > opc_eff + ctx_len)))
        bad = bad | ((kind == C.TAG_COPY4) & (b4 != 0))
        bad = bad | (is_lit & (extra == 4) & ((b4 & 0xC0) != 0))
        return hdr, ln, jnp.where(is_lit, 0, d), bad

    # ---- one piece per step: scalar parse (amortized by coalescing) plus
    # one single-code-path vector piece on the unified image ----
    def step(st):
        ip, opc, err, rem, dist, src, done = st

        # -- parse a new op when the current one is exhausted --
        def do_parse(_):
            hdr, ln, d, bad = parse_at(ip, opc)
            is_lit = d == 0

            # coalesce the same-distance copy chain that follows a pattern
            # or max-length copy (the 60/64 chunk tail of long matches,
            # snappy_compression.c:153-165, and run streams): each absorbed
            # op is validated exactly as if executed alone.  Gated so the
            # common isolated short copy pays no peek-parse.
            def absorb(a):
                ip_a, rem_a, _ = a
                h2, l2, d2, bad2 = parse_at(ip_a, opc + rem_a)
                cont = (ip_a < comp_len) & ~bad2 & (d2 == d)
                return (
                    jnp.where(cont, ip_a + h2, ip_a),
                    jnp.where(cont, rem_a + l2, rem_a),
                    cont,
                )

            chainable = ~is_lit & ~bad & (
                (d == 1) | (d == 2) | (d == 4) | (ln == C.MAX_COPY_LEN)
            )
            ip_l = ip + hdr + jnp.where(is_lit, ln, 0)
            ip_c, rem_c, _ = lax.while_loop(
                lambda a: a[2], absorb, (ip + hdr, ln, chainable)
            )
            ip2 = jnp.where(bad, ip, jnp.where(is_lit, ip_l, ip_c))
            rem2 = jnp.where(bad, 0, jnp.where(is_lit, ln, rem_c))
            return (
                ip2,
                rem2,
                jnp.where(bad, dist, d),
                # literal source as an IMAGE address (comp region at COMP_OFF)
                jnp.where(bad | ~is_lit, src, ip + hdr + COMP_OFF),
                jnp.int32(0),
                bad.astype(jnp.int32),
            )

        need = (rem == 0) & (ip < comp_len)
        # branchless parse: always run the parse dataflow, commit with
        # selects — measured ~3% faster than a lax.cond per piece on the
        # bench corpus (the scalar branch cost exceeds ~40 wasted scalar
        # ops on mid-op iterations); the r3 A/B lever is retired
        pip, prem, pdist, psrc, pdone, pbad = do_parse(0)
        ip = jnp.where(need, pip, ip)
        rem = jnp.where(need, prem, rem)
        dist = jnp.where(need, pdist, dist)
        src = jnp.where(need, psrc, src)
        done = jnp.where(need, pdone, done)
        err = err | jnp.where(need, pbad, 0)

        # -- emit one piece of the current op --
        live = (err == 0) & (rem > 0)
        is_lit = dist == 0
        is_pat = (dist == 1) | (dist == 2) | (dist == 4)
        ds = jnp.maximum(dist, 1)
        dd = done - done % ds + ds          # largest safe read-behind period
        lp = jnp.minimum(rem, PIECE_MAX)
        lp = jnp.where(is_lit | is_pat, lp, jnp.minimum(lp, dd))
        s = jnp.where(is_lit, src, out_base + opc - dd)

        @pl.when(live & ~is_pat)
        def _():
            _piece(uni_ref, s, out_base + opc, lp)

        @pl.when(live & is_pat)
        def _():
            _pattern(uni_ref, out_base + opc, lp, dist)

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

    def loop_cond(st):
        ip, opc, err, rem, dist, src, done = st
        return (err == 0) & (opc < out_len) & ((rem > 0) | (ip < comp_len))

    def loop_body(st):
        # second piece per iteration halves the loop-condition overhead;
        # step() self-guards when the block finished
        return step(step(st))

    z = jnp.int32(0)
    ip, opc, err, rem, dist, src, done = lax.while_loop(
        loop_cond, loop_body, (z, z, z, z, z, z, z)
    )
    return ip, opc, err, rem


def _decode_kernel(comp_lens_ref, out_lens_ref, smem_ref, comp_v_ref,
                   out_ref, ok_ref, uni_ref):
    g = pl.program_id(0)
    comp_len = comp_lens_ref[g]
    out_len = out_lens_ref[g]

    # unified image: guard row 0, comp words at rows 1..144, zeroed
    # output at 145..272
    uni_ref[0:1, :] = jnp.zeros((1, 128), jnp.int32)
    uni_ref[1 : 1 + COMP_ROWS, :] = comp_v_ref[0]
    uni_ref[1 + COMP_ROWS : UROWS, :] = jnp.zeros(
        (UROWS - COMP_ROWS - 1, 128), jnp.int32
    )

    ip, opc, err, rem = _block_loop(
        smem_ref, uni_ref, comp_len, out_len, jnp.int32(0), OUT_BASE
    )

    orow = OUT_BASE // 512
    out_ref[0] = uni_ref[orow : orow + OUT_ROWS, :]
    ok = ((err == 0) & (ip == comp_len) & (opc == out_len) & (rem == 0)).astype(
        jnp.int32
    )
    ok_ref[0] = jnp.full((8, 128), ok, jnp.int32)


def _pack_words(u8: jnp.ndarray, ncols: int) -> jnp.ndarray:
    # bitcast, not shift-assemble: a (.., ncols, 4) uint32 intermediate
    # pads its minor dim to 128 lanes on this target (32x HBM inflation)
    return lax.bitcast_convert_type(
        u8.reshape(u8.shape[0], ncols, 4), jnp.int32
    )


def _unpack_words(w: jnp.ndarray) -> jnp.ndarray:
    # bitcast for the same padded-intermediate reason as _pack_words
    return lax.bitcast_convert_type(w, jnp.uint8).reshape(
        w.shape[0], w.shape[1] * 4
    )


@jax.jit
def decode_blocks_vm2(comp_u8: jnp.ndarray, comp_lens: jnp.ndarray, out_lens: jnp.ndarray):
    """Batched block decode on the v2 VM: (B, PAD_OUT) uint8 + (B,) int32 x2
    -> ((B, BS) uint8, (B,) bool).  Contract-identical to
    decode_vm.decode_blocks_vm (0-length pad streams report ok)."""
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
        _decode_kernel,
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


# ---------------------------------------------------------------------------
# Windowed stream decoder: sequential chunk chain with a sliding 64 KiB
# context — the device equivalent of the reference's source-window refill
# loop (snappy_decompression.c:154-161) for streams whose ops straddle
# 64 KiB output boundaries (not produced by block-disciplined encoders, but
# valid Snappy).  Chunks are cut at op boundaries by
# framing.split_ops_windowed; each grid step decodes one chunk with the
# previous 64 KiB of output resident as copy context and slides the window.
# ---------------------------------------------------------------------------

CTX_ROWS = OUT_ROWS                           # 128 rows = 64 KiB context
CTX_BASE = COMP_OFF + COMP_ROWS * 512         # context bytes in the image
SOUT_BASE = CTX_BASE + CTX_ROWS * 512         # chunk output starts here
SROWS = 1 + COMP_ROWS + CTX_ROWS + OUT_ROWS + 7   # 408 rows incl. guard+pad


def _stream_kernel(comp_lens_ref, out_lens_ref, ctx_lens_ref, smem_ref,
                   comp_v_ref, ctx0_ref, out_ref, ok_ref, uni_ref):
    g = pl.program_id(0)
    comp_len = comp_lens_ref[g]
    out_len = out_lens_ref[g]
    ctx_len = ctx_lens_ref[g]

    uni_ref[0:1, :] = jnp.zeros((1, 128), jnp.int32)
    uni_ref[1 : 1 + COMP_ROWS, :] = comp_v_ref[0]

    # context: carried in scratch from the previous grid step; chunk 0
    # takes the caller-provided window (zeros for a fresh stream, the tail
    # of already-decoded output when chaining kernel calls)
    crow = CTX_BASE // 512
    srow = SOUT_BASE // 512

    @pl.when(g == 0)
    def _():
        uni_ref[crow : crow + CTX_ROWS, :] = ctx0_ref[...]

    uni_ref[srow:SROWS, :] = jnp.zeros((SROWS - srow, 128), jnp.int32)

    ip, opc, err, rem = _block_loop(
        smem_ref, uni_ref, comp_len, out_len, ctx_len, SOUT_BASE
    )

    out_ref[0] = uni_ref[srow : srow + OUT_ROWS, :]
    ok = ((err == 0) & (ip == comp_len) & (opc == out_len) & (rem == 0)).astype(
        jnp.int32
    )
    ok_ref[0] = jnp.full((8, 128), ok, jnp.int32)

    # slide the window: context' = last 64 KiB of (context || chunk output).
    # Chunk outputs are usually < 64 KiB (that is why the stream was not
    # block-splittable), so this is a byte-granular left shift by out_len,
    # done with the same forward window copier (src > dst, safe).
    @pl.when(out_len == BS)
    def _():
        uni_ref[crow : crow + CTX_ROWS, :] = uni_ref[srow : srow + OUT_ROWS, :]

    @pl.when((out_len > 0) & (out_len < BS))
    def _():
        def shift_body(k, _):
            done = k * PIECE_MAX
            lp = jnp.minimum(BS - done, PIECE_MAX)
            _piece(uni_ref, CTX_BASE + out_len + done, CTX_BASE + done, lp)
            return 0

        lax.fori_loop(0, (BS + PIECE_MAX - 1) // PIECE_MAX, shift_body, 0)


@jax.jit
def decode_stream_vm(comp_u8, comp_lens, out_lens, ctx_lens, ctx0_u8):
    """Sequential windowed decode of N op chunks cut at op boundaries:
    (N, PAD_OUT) u8 + (N,) i32 comp lens + (N,) i32 out lens (<= 64 KiB
    each) + (N,) i32 available-context lens + (65536,) u8 initial context
    -> ((N, BS) u8 outputs, (N,) bool ok).  Chunk i's copies may reach
    up to ctx_lens[i] bytes before its own output (the previous chunks'
    bytes); outputs are valid in [0, out_lens[i])."""
    N = comp_u8.shape[0]
    comp_w = _pack_words(jnp.asarray(comp_u8), CW)
    ctx_w = _pack_words(jnp.asarray(ctx0_u8).reshape(1, BS), BS // 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((CW,), lambda g, *_: (g,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, COMP_ROWS, 128), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CTX_ROWS, 128), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, OUT_ROWS, 128), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((SROWS, 128), jnp.int32),
        ],
    )
    out_w, okm = pl.pallas_call(
        _stream_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((N, OUT_ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((N, 8, 128), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(
        jnp.asarray(comp_lens, jnp.int32),
        jnp.asarray(out_lens, jnp.int32),
        jnp.asarray(ctx_lens, jnp.int32),
        comp_w.reshape(N * CW),
        comp_w.reshape(N, COMP_ROWS, 128),
        ctx_w.reshape(CTX_ROWS, 128),
    )
    out = _unpack_words(out_w.reshape(N, OUT_ROWS * 128))
    ok = okm[:, 0, 0] == 1
    return out, ok
