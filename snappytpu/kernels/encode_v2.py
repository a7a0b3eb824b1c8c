"""Device block encoder v2 — sort/scan-native, fitted to measured TPU costs.

The v1 encoder (encode_jax.py) is algorithmically parallel but leans on
random gathers/scatters, which on the target TPU run at ~10 ns/element
(scalar-unit speed) — measured 11 s per 8 MiB batch.  v2 is built only from
the primitives that are actually fast on this hardware (measured per
128-block batch): `lax.sort` (~4-20 ms), cumulative/associative scans
(<1 ms), and elementwise ops — plus exactly ONE bounded gather round for
run re-gluing.

Pipeline (all per-block, batched over rows, fully inside one jit):

  1. match tiers      two content sorts, both collision-free because the
                      carried key words give EXACT LCP (<= LCP_CAP bytes) by
                      shift-and-compare (the property the reference's BST
                      variant exists for, snappy_compression_tree.c:11-24):
                      tier A (flag, 4-gram, pos) — in-group predecessors are
                      the nearest previous occurrences (the reference hash
                      chain, snappy_compression.c:303-307, resolved
                      perfectly); tier B (flag, 32-byte prefix, pos) —
                      suffix-array adjacency for long matches.
  2. sort-back        (spos, len, dist) sorted by position: a permutation
                      inverse done as a sort, not a scatter.
  3. inheritance      a match of length L at s implies a match at every
                      p in (s, s+L) with the same distance; one associative
                      scan over (s + len, dist, s) triples.
  4. election         anchored parse over 4-byte tiles: quantized max-reach
                      with hysteresis, so the winning distance is
                      piecewise-constant (emission density) instead of
                      flipping at every new record reach.  Replaces the v1
                      pointer-doubling greedy walk (17 gather rounds) with
                      two scans.
  5. re-glue          two bounded 2M-element gather rounds adopt a
                      neighbor's distance where this anchor's bytes
                      verifiably match at it — stitches run fragmentation.
  6. emission         same-d anchor runs stretch into adjacent literal slack
                      by the winners' verified lead/tail bytes, split into
                      ops with the reference's 60/64 remainder rule
                      (snappy_compression.c:153-165); every emitted byte
                      becomes a (dest, value) slot and ONE sort by dest
                      compacts the stream — no unbounded scatters.

Self-overlapping copies (dist < len) are emitted as-is; the sequential
decode VM (decode_vm.py) replicates them natively, so no ACEAPEX-style
offset flattening is needed.

Wire format: byte-identical Snappy element stream (SURVEY.md §2 format
contract).  Op starts land at arbitrary byte offsets (lead stretching and
literal-run boundaries are byte-granular) — decoders must not assume any
alignment of op boundaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..format import constants as C

BS = C.MAX_BLOCK_SIZE
PAD_OUT = C.MAX_COMPRESSED_BLOCK_SIZE
LCP_CAP = 32          # exact-match cap from the carried sort-key words
KW = LCP_CAP // 4     # carried 4-byte words per position
NEIGHBORS = (1, 2)    # sorted-order predecessor/successor ranks examined
G = 4                 # anchor tile width (== MIN_MATCH_LEN)
NA = BS // G          # anchors per block


def _pos(B, n):
    return jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (B, n))


def _words(blocks_u8: jnp.ndarray) -> jnp.ndarray:
    """Big-endian u32 word starting at every byte (zero-padded tail)."""
    B = blocks_u8.shape[0]
    b = jnp.concatenate(
        [blocks_u8.astype(jnp.uint32), jnp.zeros((B, 3), jnp.uint32)], axis=1
    )
    return (
        (b[:, :BS] << 24)
        | (b[:, 1 : BS + 1] << 16)
        | (b[:, 2 : BS + 2] << 8)
        | b[:, 3 : BS + 3]
    )


def _shift_words(w: jnp.ndarray, k: int) -> jnp.ndarray:
    """w advanced k bytes: word starting at p+k (zero-padded)."""
    B = w.shape[0]
    return jnp.concatenate([w[:, k:], jnp.zeros((B, k), jnp.uint32)], axis=1)


def _word_lcp(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Common-prefix bytes (0..4) of two big-endian u32 words."""
    d = x ^ y
    return jnp.where(
        d == 0,
        4,
        jnp.where(d < (1 << 8), 3, jnp.where(d < (1 << 16), 2, jnp.where(d < (1 << 24), 1, 0))),
    ).astype(jnp.int32)


def _shifted(a, sh, fill):
    B = a.shape[0]
    return jnp.concatenate([jnp.full((B, sh), fill, a.dtype), a[:, : BS - sh]], axis=1)


def _neighbor_lcp(ks, sh: int):
    """LCP (<=16) between each sorted slot and the slot `sh` earlier, from
    the four carried 4-byte words; pure shift-and-compare."""
    B = ks[0].shape[0]
    lcp = jnp.zeros((B, BS), jnp.int32)
    alive = jnp.ones((B, BS), jnp.bool_)
    for kw in ks:
        wl = _word_lcp(kw, _shifted(kw, sh, 0))
        lcp = lcp + jnp.where(alive, wl, 0)
        alive = alive & (wl == 4)
    return lcp


def _tier_best(sflag, spos, ks, pred_ranks, succ_ranks=()):
    """Best (lcp, cand_pos) per sorted slot against the given neighbor ranks.

    Works for any sort order; LCP is exact (<=16) from the carried words, so
    there are no hash collisions to verify (the property the reference's BST
    variant exists for, snappy_compression_tree.c:11-24)."""
    B = sflag.shape[0]
    best_len = jnp.zeros((B, BS), jnp.int32)
    best_cand = jnp.full((B, BS), -1, jnp.int32)

    def consider(cpos, cflag, clcp):
        nonlocal best_len, best_cand
        ok = (sflag == 0) & (cflag == 0) & (cpos >= 0) & (cpos < spos) & (clcp >= G)
        better = ok & ((clcp > best_len) | ((clcp == best_len) & (cpos > best_cand)))
        best_len = jnp.where(better, clcp, best_len)
        best_cand = jnp.where(better, cpos, best_cand)

    for sh in pred_ranks:
        consider(_shifted(spos, sh, -1), _shifted(sflag, sh, 1), _neighbor_lcp(ks, sh))
    for sh in succ_ranks:
        B_ = sflag.shape[0]
        npos = jnp.concatenate([spos[:, sh:], jnp.full((B_, sh), -1, jnp.int32)], axis=1)
        nflag = jnp.concatenate([sflag[:, sh:], jnp.ones((B_, sh), jnp.uint32)], axis=1)
        lcp = _neighbor_lcp(ks, sh)
        nlcp = jnp.concatenate([lcp[:, sh:], jnp.zeros((B_, sh), jnp.int32)], axis=1)
        consider(npos, nflag, nlcp)
    return best_len, best_cand


def _find_matches(blocks_u8: jnp.ndarray, n: jnp.ndarray, dense: bool = True):
    """Per-position (match_len <= 16, dist >= 1); len 0 where no match.

    Two sort tiers, both collision-free:
      tier A  (flag, w0, pos): inside an exact-4-gram group, sorted
              predecessors ARE the nearest previous occurrences — the
              reference hash chain (snappy_compression.c:303-307) with
              perfect resolution; ranks 1..4 examined.
      tier B  (flag, w0..w3, pos): suffix-array adjacency on the 16-byte
              prefix — long matches whose nearest occurrence is many
              4-gram-group slots away.  (dense profile only)
    """
    B = blocks_u8.shape[0]
    pos = _pos(B, BS)
    w = _words(blocks_u8)
    kws = tuple(_shift_words(w, 4 * j) if j else w for j in range(KW))
    flag = (pos > (n - G)[:, None]).astype(jnp.uint32)

    def finish(blen, bcand):
        mlen = jnp.minimum(blen, jnp.maximum(n[:, None] - pos, 0))
        dist = jnp.where(mlen >= G, pos - bcand, 0)
        return jnp.where(mlen >= G, mlen, 0), dist

    def sort_back(spos, blen, bcand):
        # pack (cand, len) into one payload: len <= LCP_CAP (6 bits)
        packed = (jnp.maximum(bcand, 0) << 6) | jnp.minimum(blen, 63)
        packed = jnp.where(bcand >= 0, packed, -1)
        _, mp = lax.sort((spos, packed), dimension=1, num_keys=1)
        mlen = jnp.where(mp >= 0, mp & 63, 0)
        mcand = jnp.where(mp >= 0, mp >> 6, -1)
        return finish(mlen, mcand)

    # tier A: 4-gram groups in position order; 16-byte LCP from 4 carried
    # words (nearest occurrences are short-match candidates — the deep-LCP
    # work is tier B's job)
    sortedA = lax.sort((flag, kws[0], pos) + kws[1:4], dimension=1, num_keys=3)
    aflag, apos = sortedA[0], sortedA[2]
    aks = (sortedA[1],) + sortedA[3:]
    lenA, candA = _tier_best(aflag, apos, aks, pred_ranks=(1, 2, 3, 4))
    tiers = [sort_back(apos, lenA, candA)]

    if dense:
        # tier B: full-prefix (LCP_CAP bytes) suffix-array adjacency
        sortedB = lax.sort((flag,) + kws + (pos,), dimension=1, num_keys=1 + KW)
        bflag, bpos = sortedB[0], sortedB[-1]
        bks = sortedB[1:-1]
        lenB, candB = _tier_best(
            bflag, bpos, bks, pred_ranks=NEIGHBORS, succ_ranks=NEIGHBORS
        )
        tiers.append(sort_back(bpos, lenB, candB))

    return tiers


def _merge_max(a, b, tie_smaller_second=True):
    """Elementwise lexicographic max of tuples (first element primary)."""
    if tie_smaller_second:
        take_b = (b[0] > a[0]) | ((b[0] == a[0]) & (b[1] < a[1]))
    else:
        take_b = (b[0] > a[0]) | ((b[0] == a[0]) & (b[1] > a[1]))
    return tuple(jnp.where(take_b, y, x) for x, y in zip(a, b))


def _anchor_scan(t, op_merge):
    """Max-scan per-position tuples, evaluated AT ANCHORS only.

    winner(a=4k) = max over s <= 4k — computed as max(scan over 4-wide
    groups up to k-1, tuple at position 4k).  4x less scan work than the
    full-resolution tuple scan, bit-identical at the anchors."""
    B = t[0].shape[0]
    own = tuple(x[:, ::G] for x in t)
    gmax = own
    for j in range(1, G):
        gmax = op_merge(gmax, tuple(x[:, j::G] for x in t))
    scan = lax.associative_scan(op_merge, gmax, axis=1)
    prev = tuple(
        jnp.concatenate([jnp.full((B, 1), -(BS + 9), jnp.int32) if i == 0
                         else jnp.zeros((B, 1), x.dtype), x[:, : NA - 1]], axis=1)
        for i, x in enumerate(scan)
    )
    return op_merge(prev, own)


def _inherit(tiers, n: jnp.ndarray):
    """Per-ANCHOR inherited match (reach, dist, start): a match of length L
    at s implies a match at every p in (s, s+L) with the same distance."""
    mlen, dist = tiers[0]
    for ml, dd in tiers[1:]:
        better = (ml > mlen) | ((ml == mlen) & (dd < dist))
        mlen = jnp.where(better, ml, mlen)
        dist = jnp.where(better, dd, dist)
    B = mlen.shape[0]
    pos = _pos(B, BS)
    reach = jnp.where(mlen >= G, pos + mlen, -1)
    r, rd, rs = _anchor_scan((reach, dist, pos), _merge_max)
    return r, rd, rs


def _prop_pack(val, start, bits, idx=None):
    """Segmented forward fill via ONE native cummax: start positions are
    strictly ascending, so (index << bits) | val is monotone per segment
    order and a plain cumulative max propagates the latest start's value.
    Requires val in [0, 2^bits) and index < 2^(31-bits)."""
    B = val.shape[0]
    if idx is None:
        idx = _pos(B, val.shape[1])
    packed = jnp.where(start, (idx << bits) | val, -1)
    return lax.cummax(packed, axis=1)


def _prop_val(packed, bits):
    return jnp.where(packed >= 0, packed & ((1 << bits) - 1), 0)


def _seg_propagate(val, start):
    """Segmented forward fill: value at the latest start, per row."""
    return lax.associative_scan(
        lambda x, y: (jnp.where(y[1], y[0], x[0]), y[1] | x[1]),
        (val, start),
        axis=1,
    )[0]


_HYST_Q = 16  # reach quantum: winners switch only across 16-byte bands


def _elect(tiers, inh, n):
    """Anchor parse: quantized max-reach election with hysteresis.

    A pure max-reach parse fragments: in plain text a new record reach
    appears at almost every position, so the winning match — and its
    distance — flips anchor to anchor and copies degenerate to 4-byte tiles.
    Emission density needs PIECEWISE-CONSTANT distance, so the election key
    is (reach // 16, earliest start): a winner keeps its run until another
    match crosses a 16-byte reach band, giving ~16-byte same-distance runs.
    The exact max-reach scan (inh) backstops coverage where the quantized
    winner's true reach has already run out.

    Returns per-anchor (is_copy, d, lead_avail, tail_avail): how many bytes
    before/after the anchor tile the winning match is KNOWN to also cover —
    emission stretches runs into those slacks at byte granularity."""
    B = tiers[0][0].shape[0]
    pos = _pos(B, BS)

    mlen, dist = tiers[0]
    for ml, dd in tiers[1:]:
        better = (ml > mlen) | ((ml == mlen) & (dd < dist))
        mlen = jnp.where(better, ml, mlen)
        dist = jnp.where(better, dd, dist)

    has = mlen >= G
    reach = jnp.where(has, pos + mlen, -1)
    rq = jnp.where(has, reach // _HYST_Q, -1)
    negs = jnp.where(has, -pos, -(BS + 9))

    def opq(a, b):
        take_b = (b[0] > a[0]) | ((b[0] == a[0]) & (b[1] > a[1]))
        return tuple(jnp.where(take_b, y, x) for x, y in zip(a, b))

    _, negs1, r1a, d1a = _anchor_scan((rq, negs, reach, dist), opq)
    s1a = -negs1
    r2a, d2a, s2a = inh

    a_pos = _pos(B, NA) * G
    n_ok = (a_pos + G) <= n[:, None]
    use1 = (r1a >= a_pos + G) & (d1a >= 1) & (d1a <= a_pos)
    use2 = (r2a >= a_pos + G) & (d2a >= 1) & (d2a <= a_pos)
    is_copy = n_ok & (use1 | use2)
    ad = jnp.where(use1, d1a, jnp.where(use2, d2a, 0))
    sel_r = jnp.where(use1, r1a, r2a)
    sel_s = jnp.where(use1, s1a, s2a)
    lead = jnp.where(is_copy, jnp.maximum(a_pos - sel_s, 0), 0)
    tail = jnp.where(is_copy, jnp.maximum(sel_r - (a_pos + G), 0), 0)
    return is_copy, jnp.where(is_copy, ad, 0), lead, tail


def _reglue(blocks_u8, is_copy, ad, lead, tail, n):
    """Two bounded gather rounds (~20 ms each — the only gathers in the
    encoder): adopt a neighbor's distance where this anchor's 4 bytes
    verifiably also match at it (left-neighbor round extends runs
    rightward, right-neighbor round leftward).  Stitches the vote-boundary
    disagreements that fragment runs.  Glued anchors carry no lead/tail
    slack (only their own 4 bytes are verified at the adopted distance)."""
    B = is_copy.shape[0]
    a_pos = _pos(B, NA) * G
    w = _words(blocks_u8)
    w_a = w[:, ::G]
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]

    for direction in ("left", "right"):
        left_d = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), ad[:, : NA - 1]], axis=1)
        right_d = jnp.concatenate([ad[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
        if direction == "left":
            nb_d, other = left_d, right_d
        else:
            nb_d, other = right_d, left_d
        # only anchors that do not already continue a run on the other side
        # may switch (adopting would otherwise split an existing run)
        loose = ~is_copy | (ad != other)
        cand_ok = (
            loose & (nb_d >= 1) & (nb_d <= a_pos) & ((a_pos + G) <= n[:, None]) & (nb_d != ad)
        )
        src = jnp.where(cand_ok, a_pos - nb_d, 0)
        glue = cand_ok & (w[rows, src] == w_a)
        is_copy = is_copy | glue
        ad = jnp.where(glue, nb_d, ad)
        lead = jnp.where(glue, 0, lead)
        tail = jnp.where(glue, 0, tail)
    return is_copy, ad, lead, tail


def _emit(blocks_u8, is_copy, ad, lead, tail, n):
    """Byte-granular interval emission + ONE sort by destination.

    Anchor runs (same-d consecutive copy tiles) are stretched into the
    adjacent literal slack by the election winners' verified lead/tail
    bytes, then split into Snappy ops with the reference's 60/64 rule for
    awkward remainders (snappy_compression.c:153-165).  Every emitted byte
    becomes a (dest, value) slot; one 1-key sort compacts the stream —
    no unbounded scatters or gathers anywhere."""
    B = blocks_u8.shape[0]
    pos = _pos(B, BS)
    a_pos = _pos(B, NA) * G
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]

    # ---- run geometry over anchors ----
    prev_is = jnp.concatenate([jnp.zeros((B, 1), jnp.bool_), is_copy[:, : NA - 1]], axis=1)
    prev_d = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), ad[:, : NA - 1]], axis=1)
    run_start = is_copy & ~(prev_is & (prev_d == ad))
    nxt_is = jnp.concatenate([is_copy[:, 1:], jnp.zeros((B, 1), jnp.bool_)], axis=1)
    nxt_d = jnp.concatenate([ad[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
    run_end = is_copy & ~(nxt_is & (nxt_d == ad))

    # All forward fills below ride native cummax: scatter targets are
    # position-ordered, so (index << bits) | value is monotone and one
    # cumulative max propagates each latest mark (_prop_pack) — no
    # associative tuple scans on the hot 64k arrays.
    rev = lambda x: x[:, ::-1]

    # ---- stretch: tails first (into the following literal gap) ----
    next_start_p = rev(_prop_pack(rev(jnp.where(run_start, a_pos, 0)), rev(run_start), 17))
    nxt_exists = jnp.concatenate(
        [next_start_p[:, 1:] >= 0, jnp.zeros((B, 1), jnp.bool_)], axis=1
    )
    next_start_at_end = jnp.where(
        nxt_exists,
        jnp.concatenate([_prop_val(next_start_p, 17)[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1),
        n[:, None],
    )
    gap_next = jnp.maximum(jnp.minimum(next_start_at_end, n[:, None]) - (a_pos + G), 0)
    tail_fin = jnp.where(run_end, jnp.minimum(tail, gap_next), 0)

    # ---- leads second (into what the previous tail left over) ----
    pc_p = _prop_pack(jnp.where(run_end, a_pos + G + tail_fin, 0), run_end, 17)
    pc_p = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), pc_p[:, : NA - 1]], axis=1)
    prev_cover = _prop_val(pc_p, 17)
    lead_fin = jnp.where(run_start, jnp.minimum(lead, a_pos - prev_cover), 0)

    # ---- byte-level intervals via scatter + cummax fills ----
    ivs = jnp.where(run_start, a_pos - lead_fin, 0)               # interval start byte
    # interval end: tail of THIS run — propagate run_end info back to start
    ive_p = rev(_prop_pack(rev(jnp.where(run_end, a_pos + G + tail_fin, 0)), rev(run_end), 17))
    ive = _prop_val(ive_p, 17)                                    # per anchor: end of its run

    # Three scatter-sets (unique targets) + native cummax fills.  Values are
    # packed as (run_ordinal << 17) | value: run ordinals are ascending per
    # block (<= 14 bits), so the packed ints are monotone along the row and
    # a cumulative max propagates each run's fields to every later byte.
    # 0-based ordinal: 16384 << 17 would overflow int32, 16383 exactly fits
    ordn = lax.cumsum(run_start.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(run_start, ivs, BS + 7)

    def fill(val17):
        sc = jnp.full((B, BS), -1, jnp.int32).at[rows, tgt].set(
            jnp.where(run_start, (ordn << 17) | val17, -1), mode="drop"
        )
        return lax.cummax(sc, axis=1)

    s_p = fill(ivs)
    e_p = fill(ive)
    d_p = fill(ad)
    s_b = jnp.where(s_p >= 0, s_p & 0x1FFFF, -1)
    e_b = e_p & 0x1FFFF
    d_b = jnp.where(d_p >= 0, d_p & 0x1FFFF, 0)
    covered = (s_b >= 0) & (pos < e_b)

    # ---- op chunking (64s, with the 60-split for remainders 65..67) ----
    q = pos - s_b
    remq = e_b - pos
    on64 = (q % C.MAX_COPY_LEN) == 0
    on60 = (q % C.MAX_COPY_LEN) == 60
    # on64 boundaries with remq<4 are interior to a 60-split chunk; on60
    # boundaries exist only when the preceding on64 chunk was a 60-split
    # (its remainder was 65..67, leaving 5..7 here)
    op_start = covered & (
        (on64 & (remq >= 4)) | (on60 & (remq >= 5) & (remq <= 7))
    )
    op_len = jnp.where(
        remq <= C.MAX_COPY_LEN, remq, jnp.where(remq <= 67, 60, C.MAX_COPY_LEN)
    )
    op_len = jnp.where(op_start, op_len, 0)
    two = op_start & (op_len <= C.COPY1_MAX_LEN) & (d_b < C.COPY1_MAX_OFFSET)
    opb = jnp.where(op_start, jnp.where(two, 2, 3), 0)

    # ---- literal geometry ----
    lit = (~covered) & (pos < n[:, None])
    lit_prev = jnp.concatenate([jnp.zeros((B, 1), jnp.bool_), lit[:, : BS - 1]], axis=1)
    lstart = lit & ~lit_prev
    lit_next = jnp.concatenate([lit[:, 1:], jnp.zeros((B, 1), jnp.bool_)], axis=1)
    lend = lit & ~lit_next
    ls = lax.cummax(jnp.where(lstart, pos, -1), axis=1)
    le = lax.cummin(jnp.where(lend, pos, BS + 1)[:, ::-1], axis=1)[:, ::-1]
    rlen = jnp.where(lit, le - ls + 1, 0)
    hdr = jnp.where(
        rlen > 0,
        1 + (rlen > C.LITERAL_MAX_INLINE_LEN).astype(jnp.int32) + (rlen > 256),
        0,
    )

    # ---- per-byte emitted size -> offsets ----
    size = opb + jnp.where(lit, 1, 0) + jnp.where(lstart, hdr, 0)
    off = lax.cumsum(size, axis=1) - size
    total = jnp.sum(size, axis=1).astype(jnp.int32)

    # ---- slots ----
    INF = jnp.int32(PAD_OUT + 8)
    d_lo, d_hi = d_b & 0xFF, d_b >> 8
    b0 = jnp.where(
        two,
        (d_hi << 5) | ((op_len - 4) << 2) | C.TAG_COPY1,
        ((op_len - 1) << 2) | C.TAG_COPY2,
    )
    m = rlen - 1
    h0 = jnp.where(
        hdr == 1,
        m << 2,
        jnp.where(hdr == 2, C.LITERAL_CODE_1BYTE << 2, C.LITERAL_CODE_2BYTE << 2),
    )

    # pack (dest << 8) | byte into ONE int32 so the compaction sort moves a
    # single operand; dest <= PAD_OUT+8 fits 17 bits.  op-byte and
    # literal-header slots are position-disjoint (op starts are covered
    # bytes, literal-run starts are not), so they share three arrays.
    def pk(cond, d, v):
        return jnp.where(cond, (d << 8) | v, INF << 8)

    c1 = pk(op_start, off, b0)
    c1 = jnp.where(lstart, (off << 8) | h0, c1)
    c2 = pk(op_start, off + 1, d_lo)
    c2 = jnp.where(lstart & (hdr >= 2), ((off + 1) << 8) | (m & 0xFF), c2)
    c3 = pk(op_start & ~two, off + 2, d_hi)
    c3 = jnp.where(lstart & (hdr >= 3), ((off + 2) << 8) | (m >> 8), c3)
    c4 = pk(lit, off + jnp.where(lstart, hdr, 0), blocks_u8.astype(jnp.int32))

    # Two-stage compaction: one big sort over 4*BS slots costs ~3.3x more
    # per element than 64k-row sorts (VMEM pressure), so sort each 16k-
    # position quarter separately (all slot dests are globally monotone
    # within each array), keep each quarter's worst-case prefix, then
    # compact the concatenation with one small sort.
    Q = 4
    QP = BS // Q                      # input positions per quarter
    QCAP = QP + QP // 4 + 128         # worst-case emitted bytes per quarter
    qslots = jnp.stack(
        [c.reshape(B, Q, QP) for c in (c1, c2, c3, c4)], axis=2
    ).reshape(B * Q, 4 * QP)
    (sq,) = lax.sort((qslots,), dimension=1, num_keys=1)
    head = sq[:, :QCAP].reshape(B, Q * QCAP)
    (sp,) = lax.sort((head,), dimension=1, num_keys=1)
    out = (sp[:, :PAD_OUT] & 0xFF).astype(jnp.uint8)
    valid = (sp[:, :PAD_OUT] >> 8) < total[:, None]
    return jnp.where(valid, out, 0), total


def encode_block_core(blocks_u8: jnp.ndarray, n: jnp.ndarray, dense: bool = True):
    tiers = _find_matches(blocks_u8, n, dense=dense)
    inh = _inherit(tiers, n)
    is_copy, ad, lead, tail = _elect(tiers, inh, n)
    is_copy, ad, lead, tail = _reglue(blocks_u8, is_copy, ad, lead, tail, n)
    return _emit(blocks_u8, is_copy, ad, lead, tail, n)


@functools.partial(jax.jit, static_argnames=("dense",))
def encode_blocks_v2(blocks_u8: jnp.ndarray, lens: jnp.ndarray, dense: bool = True):
    """Batched block encode: (B, BS) uint8 + (B,) int32 ->
    ((B, PAD_OUT) uint8, (B,) int32).  Drop-in contract match for
    encode_jax.encode_blocks; dense=False skips the 16-byte tier (the
    fast-profile analog of the reference's plain hash compressor)."""
    return encode_block_core(jnp.asarray(blocks_u8), jnp.asarray(lens, jnp.int32), dense)
