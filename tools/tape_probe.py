"""Tape-VM chain decomposition probe: what serializes the movement loop?

Variants (SNAPPYTPU_TAPE_MODE):
  full-D1 / full-D3   movement with 1- or 3-deep record load-ahead
  loads               SMEM record loads + loop only (movement skipped):
                      isolates loop+load cost from the RMW chain
  const-dst           real loads + real windows, but every merge lands on a
                      fixed row: RMW with compiler-provable addresses
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


def make_kernel(mode):
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
    for mode in MODE.split(","):
        runner = run_mode(mode)
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
