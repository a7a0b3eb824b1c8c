"""Pallas decode — movement-only VM driven by a host-built piece tape.

The r4 decode anatomy (tools/dec_anatomy.py, PROFILE.md) showed the
sequential VM's cost is HALF parse chain: full work at fixed addresses ran
2.1x faster than the full VM on text (76.8 vs 159.1 ms/batch).  The parse
chain exists to discover each piece's (src, dst, len, pattern) — pure
stream structure, independent of the data bytes.  This kernel moves that
discovery to the host: cpu.stpu_build_tape parses + validates the block
(same accept set as the VM, differential-tested) and emits the EXACT piece
schedule decode_vm2's interpreter would compute; the device kernel then
executes movement records back to back — two SMEM loads and one funnel
piece per record, no parse dataflow at all.

Production fit: the tape needs the compressed bytes host-side, so this
path serves host-resident streams — api.decompress's block path and the
file codec / CLI decompress route (stream/filecodec.py), where the native
scanner already walks the stream.  Device-resident pipelines (bench's
encode->decode handoff) keep the self-contained parsing VM
(decode_vm.py dispatch).  The tape adds ~96 KiB/block of host->device
transfer (mostly zero padding) — negligible at PCIe rates; a
bucketed-width tape staging would cut it ~4x if transfer-bound
deployments ever need it.

Reference behavior covered: the decode loop of
snappy_decompression.c:229-333 with validation; the host/device split has
no reference analog (single-threaded C there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_vm2 import (
    COMP_OFF,
    COMP_ROWS,
    CW,
    OUT_BASE,
    OUT_ROWS,
    UROWS,
    _interpret,
    _pack_words,
    _pattern,
    _piece,
    _unpack_words,
)

# Records per block the SMEM tape holds (2 int32 words each; 96 KiB at
# 12288 — well under the 1 MiB SMEM with per-block streaming).  Measured
# piece counts per 64 KiB block: our encoder's worst shape (text) ~7.0k
# max, the native hash compressor's ~9.4k; adversarial-but-valid streams
# (e.g. all 1-byte literals: 32k records) overflow and fall back to the
# parsing VM.
TAPE_MAX = 12288


def _tape_kernel(nrecs_ref, tape_ref, comp_v_ref, out_ref, ok_ref, uni_ref):
    g = pl.program_id(0)
    nr = nrecs_ref[g]

    uni_ref[0:1, :] = jnp.zeros((1, 128), jnp.int32)
    uni_ref[1 : 1 + COMP_ROWS, :] = comp_v_ref[0]
    uni_ref[1 + COMP_ROWS : UROWS, :] = jnp.zeros(
        (UROWS - COMP_ROWS - 1, 128), jnp.int32
    )

    def load(r):
        rc = jnp.minimum(r, TAPE_MAX - 1)
        return tape_ref[2 * rc], tape_ref[2 * rc + 1]

    def step(st):
        """Execute the preloaded record r while issuing the SMEM loads for
        r+1 — the load latency (~110 ns) hides under the movement's vector
        work instead of preceding it (the v4 pipelining idea, with nothing
        but loads left to pipeline)."""
        r, (w0, w1) = st
        nxt = load(r + 1)
        lp = w0 >> 20
        pk2 = (w0 >> 18) & 3

        @pl.when((r < nr) & (pk2 == 0))
        def _():
            _piece(uni_ref, w0 & 0x3FFFF, w1, lp)

        @pl.when((r < nr) & (pk2 > 0))
        def _():
            _pattern(uni_ref, w1, lp, jnp.where(pk2 == 3, 4, pk2))

        return r + 1, nxt

    st = lax.while_loop(
        lambda st: st[0] < nr,
        lambda st: step(step(st)),
        (jnp.int32(0), load(jnp.int32(0))),
    )

    orow = OUT_BASE // 512
    out_ref[0] = uni_ref[orow : orow + OUT_ROWS, :]
    ok_ref[0] = jnp.full((8, 128), (nr >= 0).astype(jnp.int32), jnp.int32)


@jax.jit
def _run_tape(tapes: jnp.ndarray, nrecs: jnp.ndarray, comp_u8: jnp.ndarray):
    B = comp_u8.shape[0]
    comp_w = _pack_words(jnp.asarray(comp_u8), CW)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            # the tape streams per grid step (prefetch operands stay WHOLE
            # in the 1 MB SMEM — B tapes would blow it at B >= 16)
            pl.BlockSpec((2 * TAPE_MAX,), lambda g, *_: (g,),
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
        scratch_shapes=[
            pltpu.VMEM((UROWS, 128), jnp.int32),
        ],
    )
    out_w, okm = pl.pallas_call(
        _tape_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, OUT_ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, 128), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(
        jnp.asarray(nrecs, jnp.int32),
        jnp.asarray(tapes, jnp.int32).reshape(B * 2 * TAPE_MAX),
        comp_w.reshape(B, COMP_ROWS, 128),
    )  # nrecs is the single prefetch operand; tape + comp stream per block
    out = _unpack_words(out_w.reshape(B, OUT_ROWS * 128))
    ok = okm[:, 0, 0] == 1
    return out, ok


def _tape_kernel_k(K):
    """K-way block-interleaved movement kernel: one grid step drives K
    independent interpreters on K separate VMEM images.  The per-record
    chain is latency-bound (~170 ns: SMEM record -> window -> RMW), and a
    single block's pieces are serially dependent through its image — but
    DIFFERENT blocks' chains are independent, and separate scratch refs
    make that independence visible to the compiler (unlike v3's attempt,
    whose 42-scalar parse states hit the register wall: tape state is 5
    scalars per block)."""

    def kern(nrecs_ref, tape_ref, comp_v_ref, out_ref, ok_ref, *unis):
        g = pl.program_id(0)
        nrs = [nrecs_ref[g * K + k] for k in range(K)]
        nrmax = nrs[0]
        for k in range(1, K):
            nrmax = jnp.maximum(nrmax, nrs[k])
        for k in range(K):
            unis[k][0:1, :] = jnp.zeros((1, 128), jnp.int32)
            unis[k][1 : 1 + COMP_ROWS, :] = comp_v_ref[0, k]
            unis[k][1 + COMP_ROWS : UROWS, :] = jnp.zeros(
                (UROWS - COMP_ROWS - 1, 128), jnp.int32
            )

        def load(k, r):
            rc = jnp.minimum(r, TAPE_MAX - 1)
            return tape_ref[2 * (k * TAPE_MAX + rc)], tape_ref[2 * (k * TAPE_MAX + rc) + 1]

        def move(k, w0, w1, live):
            lp = w0 >> 20
            pk2 = (w0 >> 18) & 3

            @pl.when(live & (pk2 == 0))
            def _():
                _piece(unis[k], w0 & 0x3FFFF, w1, lp)

            @pl.when(live & (pk2 > 0))
            def _():
                _pattern(unis[k], w1, lp, jnp.where(pk2 == 3, 4, pk2))

        def step(st):
            r, q = st
            nxt = tuple(load(k, r + 1) for k in range(K))
            for k in range(K):
                move(k, q[k][0], q[k][1], r < nrs[k])
            return r + 1, nxt

        st = lax.while_loop(
            lambda st: st[0] < nrmax,
            lambda st: step(step(st)),
            (jnp.int32(0), tuple(load(k, jnp.int32(0)) for k in range(K))),
        )
        orow = OUT_BASE // 512
        for k in range(K):
            out_ref[0, k] = unis[k][orow : orow + OUT_ROWS, :]
        okv = (nrs[0] >= 0).astype(jnp.int32)
        ok_ref[0, 0] = jnp.full((8, 128), okv, jnp.int32)
        for k in range(1, K):
            ok_ref[0, k] = jnp.full((8, 128), (nrs[k] >= 0).astype(jnp.int32), jnp.int32)

    return kern


@functools.partial(jax.jit, static_argnames=("K",))
def _run_tape_k(tapes: jnp.ndarray, nrecs: jnp.ndarray, comp_u8: jnp.ndarray,
                K: int = 4):
    """K-interleaved variant of _run_tape; B must be a multiple of K.
    Blocks g*K..g*K+K-1 decode together; pair blocks with similar record
    counts (sort by nrecs) to minimize drained-lane waste."""
    B = comp_u8.shape[0]
    assert B % K == 0
    comp_w = _pack_words(jnp.asarray(comp_u8), CW)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // K,),
        in_specs=[
            pl.BlockSpec((2 * K * TAPE_MAX,), lambda g, *_: (g,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, COMP_ROWS, 128), lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, OUT_ROWS, 128), lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 8, 128), lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((UROWS, 128), jnp.int32) for _ in range(K)],
    )
    out_w, okm = pl.pallas_call(
        _tape_kernel_k(K),
        out_shape=[
            jax.ShapeDtypeStruct((B // K, K, OUT_ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((B // K, K, 8, 128), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(
        jnp.asarray(nrecs, jnp.int32),
        jnp.asarray(tapes, jnp.int32).reshape(B * 2 * TAPE_MAX),
        comp_w.reshape(B // K, K, COMP_ROWS, 128),
    )
    out = _unpack_words(out_w.reshape(B, OUT_ROWS * 128))
    ok = okm.reshape(B, 8, 128)[:, 0, 0] == 1
    return out, ok


def build_tapes(comp_np: np.ndarray, comp_lens: np.ndarray, out_lens: np.ndarray):
    """Host tape build for a padded batch; returns (tapes, nrecs) ready for
    _run_tape.  nrecs < 0 marks blocks the kernel must not decode: -9 tape
    overflow (legal stream — caller falls back to the parsing VM), -10
    malformed (reported as ok=False, same as the VM)."""
    from .. import cpu

    if not cpu.available:
        raise RuntimeError("native runtime unavailable; use decode_blocks_vm")
    return cpu.build_tapes(
        comp_np, comp_lens, out_lens, COMP_OFF, OUT_BASE, TAPE_MAX
    )


def decode_blocks_tape(comp_u8, comp_lens, out_lens):
    """Batched host-tape decode: (B, PAD_OUT) uint8 host array + (B,) lens
    -> ((B, BS) uint8, (B,) ok).  Blocks whose tape overflows TAPE_MAX
    (adversarial-but-valid streams) are decoded by the parsing VM instead;
    malformed blocks report ok=False.  Contract-identical to
    decode_blocks_vm (differential-tested)."""
    comp_np = np.asarray(comp_u8)
    cl = np.asarray(comp_lens)
    ol = np.asarray(out_lens)
    tapes, nrecs = build_tapes(comp_np, cl, ol)
    out, ok = _run_tape(tapes, nrecs, comp_np)
    out, ok = np.array(out), np.array(ok)  # writable copies (fallback fill)
    fb = nrecs == -9
    if fb.any():
        from .decode_vm import decode_blocks_vm

        o2, k2 = decode_blocks_vm(comp_np[fb], cl[fb], ol[fb])
        out[fb], ok[fb] = np.asarray(o2), np.asarray(k2)
    return out, ok
