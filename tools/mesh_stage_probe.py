"""Which encoder stage degrades under shard_map?  (mesh_device_bench found
encode +62% under shard_map over mesh(1) while decode is free.)

Times progressively longer encoder prefixes — find / +inherit+elect /
+reglue / full — direct jit vs shard_map(mesh(1)), same resident batches.
The stage whose mesh/direct ratio jumps is the partitioned-lowering
regression."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-snappytpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from snappytpu.bench import corpus
from snappytpu.format import constants as C
from snappytpu.stream import framing
from snappytpu.kernels import encode_v2 as E
from snappytpu.mesh import sharding as MS

t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

B = 128
NQ = 4
dense = os.environ.get("SNAPPYTPU_PROBE_PROFILE", "fast") != "fast"

log(f"backend {jax.default_backend()}")
mesh = MS.make_mesh(1)
shard2 = NamedSharding(mesh, P(MS.AXIS, None))
shard1 = NamedSharding(mesh, P(MS.AXIS))

plain, sharded = [], []
for q in range(NQ):
    data = np.frombuffer(corpus.mixed(B * C.MAX_BLOCK_SIZE, seed=100 + q), np.uint8)
    blocks_np, lens_np = framing.pack_blocks(data)
    plain.append((jax.device_put(jnp.asarray(blocks_np[:B])),
                  jax.device_put(jnp.asarray(lens_np[:B], jnp.int32))))
    sharded.append((jax.device_put(blocks_np[:B], shard2),
                    jax.device_put(lens_np[:B].astype(np.int32), shard1)))
_ = [int(np.asarray(jnp.sum(b[..., ::997].astype(jnp.int32)))) for b, _l in plain]
_ = [int(np.asarray(jnp.sum(b[..., ::997].astype(jnp.int32)))) for b, _l in sharded]
log("staged")


def stage_fn(upto):
    def f(b, n):
        tiers = E._find_matches(b, n, dense=dense)
        if upto == "find":
            return sum(jnp.sum(t[0][:, ::97]) for t in tiers)
        inh = E._inherit(tiers, n)
        ic, ad, ld, tl = E._elect(tiers, inh, n)
        if upto == "elect":
            return jnp.sum(ad[:, ::17]) + jnp.sum(ld) + jnp.sum(tl)
        ic, ad, ld, tl = E._reglue(b, ic, ad, ld, tl, n)
        if upto == "reglue":
            return jnp.sum(ad[:, ::17]) + jnp.sum(ld) + jnp.sum(tl)
        comp, totals = E._emit(b, ic, ad, ld, tl, n)
        return jnp.sum(totals) + jnp.sum(comp[:, ::997].astype(jnp.int32))
    return f


def timed(fn, argsets, reps=3):
    outs = [fn(*a) for a in argsets]
    _ = [int(np.asarray(r)) for r in outs]
    best = 1e9
    for _i in range(reps):
        t1 = time.perf_counter()
        outs = [fn(*a) for a in argsets]
        _ = [int(np.asarray(r)) for r in outs]
        best = min(best, (time.perf_counter() - t1) / len(argsets))
    return best


for upto in ("find", "elect", "reglue", "full"):
    f = stage_fn(upto)
    direct = jax.jit(f)
    meshy = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=(P(MS.AXIS, None), P(MS.AXIS)),
                                  out_specs=P(), check_vma=False))
    td = timed(direct, plain)
    tm = timed(meshy, sharded)
    log(f"{upto:7s} direct {td*1000:8.2f} ms  mesh1 {tm*1000:8.2f} ms  "
        f"delta {(tm-td)*1000:+7.2f} ms ({(tm/td-1)*100:+.1f}%)")
log("DONE")
