""">=128 MB single-chip device benchmark (BASELINE config-3 analog).

Times DEVICE COMPUTE with resident data — the honest per-chip number on
this tunneled runtime (see PROFILE.md: host<->device transfers here run at
~0.5 MB/s, three orders of magnitude below real PCIe; on real hardware the
staging phases are negligible).  Protocol: stage the Silesia stand-in once,
encode/decode as queued 128-block batches whose jit wrappers reduce to
scalars, fetch only scalars as the completion barrier, verify the round
trip by device-side checksum.  Appends reference-schema rows (backend
"device" with phase-standard columns) to Test_results_tpu/.

SNAPPYTPU_BIG_MB       input size, default 128
SNAPPYTPU_BIG_PROFILES comma list, default dense,fast
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-snappytpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from snappytpu.bench import corpus, metrics
from snappytpu.format import constants as C
from snappytpu.stream import framing
from snappytpu.kernels.encode_v2 import encode_block_core
from snappytpu.kernels.decode_vm import decode_blocks_vm

t0 = time.time()
def log(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)

MB = int(os.environ.get("SNAPPYTPU_BIG_MB", "128"))
PROFILES = os.environ.get("SNAPPYTPU_BIG_PROFILES", "dense,fast").split(",")
CHUNK = 128
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "Test_results_tpu")

log(f"backend {jax.default_backend()}; building {MB} MB silesia stand-in")
data = np.frombuffer(corpus.silesia_standin(MB << 20)[: MB << 20], np.uint8)
blocks_np, lens_np = framing.pack_blocks(data)
B = blocks_np.shape[0]
nch = B // CHUNK
assert B % CHUNK == 0

log(f"staging {nch} batches of {CHUNK} blocks")
bl = [jax.device_put(jnp.asarray(blocks_np[i * CHUNK:(i + 1) * CHUNK])) for i in range(nch)]
ll = [jax.device_put(jnp.asarray(lens_np[i * CHUNK:(i + 1) * CHUNK], jnp.int32)) for i in range(nch)]
_ = [int(np.asarray(jnp.sum(b[..., ::997].astype(jnp.int32)))) for b in bl]
log("staged")

for profile in PROFILES:
    dense = profile != "fast"

    @jax.jit
    def enc_probe(b, n):
        comp, totals = encode_block_core(b, n, dense)
        return jnp.sum(totals), jnp.sum(comp[..., ::997].astype(jnp.int32))

    outs = [enc_probe(b, n) for b, n in zip(bl, ll)]
    _ = [int(np.asarray(o[0])) for o in outs]          # compile+warm
    best = 1e9
    for _ in range(2):
        t1 = time.perf_counter()
        outs = [enc_probe(b, n) for b, n in zip(bl, ll)]
        tot = sum(int(np.asarray(o[0])) for o in outs)
        best = min(best, time.perf_counter() - t1)
    r = metrics.Result("compress", int(data.size), int(tot), best, "device")
    metrics.write_result_csv(
        os.path.join(OUT, f"compression_results_device_{profile}.csv"), r)
    log(f"encode {profile}: {best*1000:.1f} ms, {r.speed_mbps:.1f} MB/s, ratio {r.comp_ratio:.3f}")

    # decode: comp stays device-resident; verify by device-side checksum
    @jax.jit
    def enc_keep(b, n):
        return encode_block_core(b, n, dense)

    comp_dev = [enc_keep(b, n) for b, n in zip(bl, ll)]

    @jax.jit
    def dec_verify(comp, totals, n, ref_blocks):
        out, ok = decode_blocks_vm(comp, totals, n)
        match = jnp.sum((out == ref_blocks).all(axis=1).astype(jnp.int32))
        return jnp.sum(ok.astype(jnp.int32)), match

    outs = [dec_verify(c, t, n, b) for (c, t), n, b in zip(comp_dev, ll, bl)]
    okc = sum(int(np.asarray(o[0])) for o in outs)
    mc = sum(int(np.asarray(o[1])) for o in outs)
    assert okc == B, f"decode flagged {B-okc} blocks corrupt"
    assert mc == B, f"round trip mismatch on {B-mc} blocks"

    @jax.jit
    def dec_probe(comp, totals, n):
        out, ok = decode_blocks_vm(comp, totals, n)
        return jnp.sum(ok.astype(jnp.int32)), jnp.sum(out[..., ::997].astype(jnp.int32))

    outs = [dec_probe(c, t, n) for (c, t), n in zip(comp_dev, ll)]
    _ = [int(np.asarray(o[0])) for o in outs]
    best = 1e9
    for _ in range(2):
        t1 = time.perf_counter()
        outs = [dec_probe(c, t, n) for (c, t), n in zip(comp_dev, ll)]
        _ = [int(np.asarray(o[0])) for o in outs]
        t_el = time.perf_counter() - t1
        best = min(best, t_el)
    r = metrics.Result("decompress", int(tot), int(data.size), best, "device")
    metrics.write_result_csv(
        os.path.join(OUT, f"decompression_results_device_{profile}.csv"), r)
    log(f"decode {profile}: {best*1000:.1f} ms, {r.speed_mbps:.1f} MB/s (comp-byte basis), "
        f"uncompressed {int(data.size)/best/1e6:.1f} MB/s, blocks exact {mc}/{B}")

log("DONE")
