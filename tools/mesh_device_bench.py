"""mesh(1) shard_map overhead on the REAL chip (VERDICT r3 weak #7).

The mesh8 CSV series runs on the virtual CPU mesh (correctness); nothing
had measured what `shard_map` dispatch costs ON TPU beyond the raw
kernels.  This times the same encoder/decoder twice on identical resident
batches — direct jit vs shard_map over a 1-device mesh — and appends a
reference-schema mesh1-device series.  The delta bounds the per-call cost
the 8-chip config pays beyond the kernels themselves (the collectives are
free here: a 1-mesh inserts none).

Protocol: honest tunneled-TPU rules (resident data, scalar-reducing jit
wrappers, queued batches, best-of-3).
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-snappytpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from snappytpu.bench import corpus, metrics
from snappytpu.format import constants as C
from snappytpu.stream import framing
from snappytpu.kernels.encode_v2 import encode_block_core
from snappytpu.kernels.decode_vm import decode_blocks_vm
from snappytpu.mesh import sharding as MS

t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

B = 128
NQ = int(os.environ.get("SNAPPYTPU_MESH_NQ", "4"))
PROFILE = os.environ.get("SNAPPYTPU_MESH_PROFILE", "fast")
dense = PROFILE != "fast"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "Test_results_tpu")

log(f"backend {jax.default_backend()}")
mesh = MS.make_mesh(1)
shard2 = NamedSharding(mesh, P(MS.AXIS, None))
shard1 = NamedSharding(mesh, P(MS.AXIS))

# two stagings of the same data: plain buffers for the direct jit (a jit
# fed NamedSharding inputs traces with sharding-in-types and the reglue
# gather cannot resolve an out spec), mesh-sharded for shard_map
batches = []       # plain
batches_m = []     # mesh-sharded
for q in range(NQ):
    data = np.frombuffer(corpus.mixed(B * C.MAX_BLOCK_SIZE, seed=100 + q), np.uint8)
    blocks_np, lens_np = framing.pack_blocks(data)
    batches.append((jax.device_put(jnp.asarray(blocks_np[:B])),
                    jax.device_put(jnp.asarray(lens_np[:B], jnp.int32))))
    batches_m.append((jax.device_put(blocks_np[:B], shard2),
                      jax.device_put(lens_np[:B].astype(np.int32), shard1)))
_ = [int(np.asarray(jnp.sum(b[..., ::997].astype(jnp.int32)))) for b, _l in batches]
_ = [int(np.asarray(jnp.sum(b[..., ::997].astype(jnp.int32)))) for b, _l in batches_m]
log("inputs staged (plain + mesh-sharded)")


def timed(fn, argsets, reps=3):
    outs = [fn(*a) for a in argsets]
    _ = [int(np.asarray(jax.tree.leaves(r)[0])) for r in outs]
    best = 1e9
    for _i in range(reps):
        t1 = time.perf_counter()
        outs = [fn(*a) for a in argsets]
        _ = [int(np.asarray(jax.tree.leaves(r)[0])) for r in outs]
        best = min(best, (time.perf_counter() - t1) / len(argsets))
    return best


# --- encode: direct jit vs shard_map over mesh(1) ---
# NOTE: the shard_map'd callable is already jitted and cannot be nested in
# another jit (the sharded-type gather inside reglue fails to re-trace);
# both sides use an identical small-fetch barrier (totals, 512 B/batch)
# so the comparison carries the same per-call fetch cost.
enc_direct = jax.jit(lambda b, l: encode_block_core(b, l, dense))
enc_mesh = MS.sharded_encode(mesh, dense)


def timed2(fn, argsets, reps=3):
    outs = [fn(*a) for a in argsets]
    _ = [int(np.asarray(jax.tree.leaves(r)[-1]).sum()) for r in outs]
    best = 1e9
    for _i in range(reps):
        t1 = time.perf_counter()
        outs = [fn(*a) for a in argsets]
        _ = [int(np.asarray(jax.tree.leaves(r)[-1]).sum()) for r in outs]
        best = min(best, (time.perf_counter() - t1) / len(argsets))
    return best


td = timed2(enc_direct, batches)
tm = timed2(enc_mesh, batches_m)
mb = B * C.MAX_BLOCK_SIZE / 1e6
log(f"encode {PROFILE}: direct {td*1000:8.2f} ms/batch ({mb/td:6.1f} MB/s)  "
    f"mesh1 {tm*1000:8.2f} ms/batch ({mb/tm:6.1f} MB/s)  "
    f"overhead {(tm-td)*1000:+6.2f} ms ({(tm/td-1)*100:+.1f}%)")

# totals for the CSV row / decode inputs
enc_keep = jax.jit(lambda b, l: encode_block_core(b, l, dense))
comp_dev = [enc_keep(b, l) for b, l in batches]
tot = sum(int(np.asarray(jnp.sum(t))) for _c, t in comp_dev)
r = metrics.Result("compress", NQ * B * C.MAX_BLOCK_SIZE, tot, tm * NQ, "device-mesh1")
metrics.write_result_csv(os.path.join(OUT, f"compression_results_mesh1_device_{PROFILE}.csv"), r)

# --- decode ---
dec_direct = jax.jit(lambda c, t, l: decode_blocks_vm(c, t, l))
dec_mesh = MS.sharded_decode(mesh)

dec_sets = [(c, t, l) for (c, t), (_b, l) in zip(comp_dev, batches)]
dec_sets_m = [
    (jax.device_put(np.asarray(c), shard2), jax.device_put(np.asarray(t), shard1),
     jax.device_put(np.asarray(l), shard1))
    for c, t, l in dec_sets
]
td = timed2(dec_direct, dec_sets)
tm = timed2(dec_mesh, dec_sets_m)
log(f"decode: direct {td*1000:8.2f} ms/batch ({mb/td:6.1f} MB/s)  "
    f"mesh1 {tm*1000:8.2f} ms/batch ({mb/tm:6.1f} MB/s)  "
    f"overhead {(tm-td)*1000:+6.2f} ms ({(tm/td-1)*100:+.1f}%)")
r = metrics.Result("decompress", tot, NQ * B * C.MAX_BLOCK_SIZE, tm * NQ, "device-mesh1")
metrics.write_result_csv(os.path.join(OUT, f"decompression_results_mesh1_device_{PROFILE}.csv"), r)
log("DONE")
