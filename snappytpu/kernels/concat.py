"""Pallas variable-length row concatenation (device-side `compact`).

Concatenates S variable-length byte pieces per block into one contiguous
row — the device equivalent of the native host runtime's `stpu_compact`
(cpu/csrc/snappy_cpu.cc) for fixed piece count.  Used by the encoder's
emission stage to assemble per-section compacted slot streams into the final
per-block compressed row without a full-width sort (encode_v2._emit), and
usable as an on-device ordered gather step for mesh assembly.

Layout: bytes are packed 4-per-lane as little-endian int32 words, rows of
128 lanes (512 B), the same VMEM contract as decode_vm.  Piece k of block b
lives at byte offset k*CAP of the flattened piece buffer and is copied to
the running output cursor with the decode VM's funnel-shift window copier
(`_piece_copy`), 504 bytes per merge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_vm import _interpret, _pack_words, _piece_copy, _unpack_words


def _concat_kernel(lens_ref, pieces_ref, out_ref, src_rows: int, out_rows: int,
                   cap: int, npieces: int):
    b = pl.program_id(0)
    out_ref[...] = jnp.zeros_like(out_ref)

    def piece_body(s, cursor):
        ln = lens_ref[b * npieces + s]

        def chunk_cond(st):
            done, _ = st
            return done < ln

        def chunk_body(st):
            done, cur = st
            lp = jnp.minimum(ln - done, 504)
            _piece_copy(pieces_ref, src_rows, out_ref, s * cap + done, cur, lp,
                        bi=0, out_rows=out_rows)
            return done + lp, cur + lp

        _, cursor = lax.while_loop(chunk_cond, chunk_body, (jnp.int32(0), cursor))
        return cursor

    lax.fori_loop(0, npieces, piece_body, jnp.int32(0))


def concat_rows(pieces: jnp.ndarray, lens: jnp.ndarray, out_cap: int):
    """(B, S, CAP) uint8 pieces + (B, S) int32 lens -> (B, out_cap) uint8
    where row b is the concatenation of its S pieces' first lens[b, s] bytes
    (zero-padded).  CAP and out_cap must be multiples of 512 and
    sum(lens[b]) <= out_cap.
    """
    B, S, CAP = pieces.shape
    words = _pack_words(pieces.reshape(B, S * CAP), S * CAP // 4)
    return concat_rows_words(words.reshape(B, S, CAP // 4), lens, out_cap)


def concat_rows_words(words: jnp.ndarray, lens: jnp.ndarray, out_cap: int):
    """concat_rows for callers that already hold packed little-endian words:
    (B, S, CAP/4) int32 + byte lens -> (B, out_cap) uint8.  Skipping the
    u8->word repack matters: _pack_words' (.., ncols, 4) intermediate pads
    its minor dim to 128 lanes on this target — a 32x-inflated HBM
    temporary (6 GB at B=512) that capped the batch size and taxed every
    encode dispatch."""
    B, S, CAPW = words.shape
    CAP = CAPW * 4
    assert CAP % 512 == 0 and out_cap % 512 == 0
    src_rows = S * CAP // 512
    out_rows = out_cap // 512

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, src_rows, 128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_rows, 128), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out_w = pl.pallas_call(
        lambda lens_ref, pieces_ref, out_ref: _concat_kernel(
            lens_ref, pieces_ref, out_ref, src_rows, out_rows, CAP, S
        ),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(jnp.asarray(lens, jnp.int32).reshape(B * S),
      jnp.asarray(words).reshape(B, src_rows, 128))
    return _unpack_words(out_w.reshape(B, out_rows * 128))
