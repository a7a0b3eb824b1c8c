"""Decode-only stage profile: times decode_blocks_vm on pre-encoded batches
of each corpus shape (mixed / text / runs / random), honest queued-dispatch
protocol (see tools/stage_profile.py)."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from snappytpu.bench import corpus
from snappytpu.format import constants as C
from snappytpu.stream import framing
from snappytpu.kernels import encode_v2 as E
from snappytpu.kernels import decode_vm as V

t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

B = int(os.environ.get("SNAPPYTPU_DEC_B", "128"))
NQ = int(os.environ.get("SNAPPYTPU_DEC_NQ", "4"))
WHICH = os.environ.get("SNAPPYTPU_DEC_CORPUS", "mixed,text").split(",")
# which decoder to time: "dispatch" (production decode_blocks_vm), "2", "4", "tape"
VM = os.environ.get("SNAPPYTPU_DEC_VM", "dispatch")
# cache key: hash of the encoder module source + profile, so cached
# compressed inputs can never go silently stale when the encoder changes
# (VERDICT r4 weak #7 — replaces the manual TAG bump)
import hashlib
with open(E.__file__, "rb") as _f:
    TAG = hashlib.sha256(_f.read()).hexdigest()[:12] + "-dense"
log(f"backend {jax.default_backend()} vm={VM}")

if VM == "2":
    from snappytpu.kernels.decode_vm2 import decode_blocks_vm2 as DEC
elif VM == "4":
    from snappytpu.kernels.decode_vm4 import decode_blocks_vm4 as DEC
elif VM == "tape":
    # movement-only VM on host-built tapes: argsets are (tapes, nrecs, comp)
    # — the tape build is host work measured separately (it replaces the
    # device parse chain; see kernels/decode_tape.py)
    from snappytpu.kernels.decode_tape import _run_tape as DEC
else:
    DEC = V.decode_blocks_vm

makers = {
    "mixed": corpus.mixed,
    "text": corpus.text,
    "runs": corpus.low_entropy,
    "random": corpus.random_bytes,
}

enc = jax.jit(lambda b, n: E.encode_block_core(b, n, True))

def prof(name, argsets, reps=3):
    g = jax.jit(lambda c, t, l: [jnp.sum(x[..., ::997].astype(jnp.int32))
                                 for x in jax.tree.leaves(DEC(c, t, l))])
    outs = [g(*a) for a in argsets]
    _ = [int(np.asarray(r[0])) for r in outs]
    best = 1e9
    for _ in range(reps):
        t1 = time.perf_counter()
        outs = [g(*a) for a in argsets]
        _ = [int(np.asarray(r[0])) for r in outs]
        best = min(best, (time.perf_counter() - t1) / len(argsets))
    mbs = B * 64 * 1024 / 1e6 / best
    log(f"decode {name:8s} {best*1000:8.2f} ms/batch  {mbs:7.1f} MB/s")
    return best

for which in WHICH:
    mk = makers.get(which)
    if mk is None:
        log(f"skip {which} (no corpus fn)")
        continue
    sets = []
    for q in range(NQ):
        # cache the encoded batches on disk: re-encoding + device->host
        # fetch over the tunnel costs minutes per run otherwise
        cache = f"/tmp/decprof_{TAG}_{which}_{q}_{B}.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            comp_np, totals_np, lens_np = z["comp"], z["totals"], z["lens"]
        else:
            data = np.frombuffer(mk(B * C.MAX_BLOCK_SIZE, seed=300 + q), np.uint8)
            blocks_np, lens_np = framing.pack_blocks(data)
            bl = jax.device_put(jnp.asarray(blocks_np[:B]))
            ll0 = jax.device_put(jnp.asarray(lens_np[:B], jnp.int32))
            comp, totals = enc(bl, ll0)
            comp_np, totals_np = np.asarray(comp), np.asarray(totals)
            lens_np = np.asarray(lens_np[:B], np.int32)
            np.savez_compressed(cache, comp=comp_np, totals=totals_np, lens=lens_np)
        if VM == "tape":
            from snappytpu import cpu as scpu
            from snappytpu.kernels import decode_tape as DT
            from snappytpu.kernels.decode_vm2 import COMP_OFF, OUT_BASE
            tapes, nrecs = scpu.build_tapes(
                comp_np, totals_np, lens_np, COMP_OFF, OUT_BASE, DT.TAPE_MAX)
            assert (nrecs >= 0).all(), f"{which}: tape overflow/malformed {nrecs.min()}"
            sets.append((jax.device_put(jnp.asarray(tapes)),
                         jax.device_put(jnp.asarray(nrecs)),
                         jax.device_put(jnp.asarray(comp_np))))
            continue
        sets.append((jax.device_put(jnp.asarray(comp_np)),
                     jax.device_put(jnp.asarray(totals_np)),
                     jax.device_put(jnp.asarray(lens_np, jnp.int32))))
    _ = int(np.asarray(jnp.sum(sets[-1][0][..., ::997].astype(jnp.int32))))
    log(f"{which}: staged")
    prof(which, sets)
log("DONE")
