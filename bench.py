"""Benchmark runner: encode + decode GB/s per chip (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

vs_baseline compares against the reference C codec's measured 1 MB numbers
(BASELINE.md: 58.7 MB/s encode, 134.6 MB/s decode -> 40.9 MB/s combined
encode+decode throughput on one CPU core).

Measurement methodology (this target is a TUNNELED TPU):
  * block_until_ready can return before execution finishes, so every timed
    call is a jit wrapper that reduces its outputs to a few scalars and the
    timer fetches them to host — the honest completion barrier;
  * one dispatch+fetch round trip costs ~15-30 ms, so work is queued as
    NQ distinct 128-block batches per rep and the scalars are fetched once
    at the end, amortizing the overhead;
  * each batch holds DIFFERENT data (no reliance on runtime memoization
    behavior), and reps take the best-of-N to shed tunnel jitter.

SNAPPYTPU_BENCH_MB   total input size (default 32)
SNAPPYTPU_BENCH_REPS timing repetitions (default 3)
SNAPPYTPU_BENCH_PROFILE=1  also print a per-stage breakdown to stderr
                           (wire-up of snappytpu.profiling.StageTimer)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-snappytpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from snappytpu import cpu  # noqa: E402
from snappytpu.bench import corpus  # noqa: E402
from snappytpu.format import constants as C  # noqa: E402
from snappytpu.profiling import StageTimer  # noqa: E402

# reference combined enc+dec MB/s at 1 MB (BASELINE.md)
_REF_COMBINED_MBPS = 1.0 / (1.0 / 58.7 + 1.0 / 134.6)

BENCH_MB = int(os.environ.get("SNAPPYTPU_BENCH_MB", "32"))
REPS = int(os.environ.get("SNAPPYTPU_BENCH_REPS", "3"))
PROFILE = os.environ.get("SNAPPYTPU_BENCH_PROFILE", "0") == "1"
CHUNK = 128  # blocks per device dispatch (8 MiB input)


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from snappytpu.kernels.decode_vm import decode_blocks_vm
    from snappytpu.kernels.encode_v2 import encode_block_core
    from snappytpu.stream import framing

    timer = StageTimer()
    data = np.frombuffer(corpus.mixed(BENCH_MB << 20, seed=42), np.uint8)
    blocks_np, lens_np = framing.pack_blocks(data)
    B = blocks_np.shape[0]
    nch = (B + CHUNK - 1) // CHUNK
    pad_B = nch * CHUNK
    bp = np.zeros((pad_B, C.MAX_BLOCK_SIZE), np.uint8)
    lp = np.zeros(pad_B, np.int32)
    bp[:B], lp[:B] = blocks_np, lens_np

    with timer.stage("h2d"):
        bl = [jax.device_put(jnp.asarray(bp[i * CHUNK : (i + 1) * CHUNK])) for i in range(nch)]
        ll = [jax.device_put(jnp.asarray(lp[i * CHUNK : (i + 1) * CHUNK])) for i in range(nch)]
        # force the transfers before timing compute
        _ = [int(np.asarray(jnp.sum(b[..., ::997].astype(jnp.int32)))) for b in bl]

    # Headline profile: "fast" (tier A + stride-4 deep tier + run tiers) —
    # the analog of the reference's benchmarked hash compressor, and its
    # measured ratio on this corpus exceeds the reference's (2.563 vs
    # 2.552).  The "dense" profile (byte-resolution deep tier; compressed
    # size <= the reference's on every fixture) is also measured and
    # reported in the extra fields.
    PROFILE_DENSE = os.environ.get("SNAPPYTPU_BENCH_DENSE", "0") == "1"
    dense = PROFILE_DENSE

    # timed wrappers: full computation + tiny reductions fetched as barrier
    enc = jax.jit(lambda b, l: encode_block_core(b, l, dense))

    @jax.jit
    def enc_timed(b, l):
        comp, totals = encode_block_core(b, l, dense)
        return jnp.sum(totals) + jnp.sum(comp[:, ::997].astype(jnp.int32))

    @jax.jit
    def dec_timed(c, t, l):
        out, ok = decode_blocks_vm(c, t, l)
        return jnp.sum(ok.astype(jnp.int32)) + jnp.sum(out[:, ::997].astype(jnp.int32))

    _log("warmup encode")
    _ = [int(np.asarray(enc_timed(b, l))) for b, l in zip(bl, ll)]
    _log("timing encode")
    enc_s = 1e18
    for _ in range(REPS):
        t0 = time.perf_counter()
        sums = [enc_timed(b, l) for b, l in zip(bl, ll)]
        _ = [int(np.asarray(s)) for s in sums]
        enc_s = min(enc_s, time.perf_counter() - t0)

    # companion row: the OTHER profile's encode numbers in the same run
    # (dense holds the strict <=-reference size contract; fast is the
    # headline hash-compressor analog) — scalar fetches only
    @jax.jit
    def enc_other(b, l):
        comp, totals = encode_block_core(b, l, not dense)
        return jnp.sum(totals) + jnp.sum(comp[:, ::997].astype(jnp.int32)), jnp.sum(totals)

    _log("timing companion-profile encode")
    _ = [int(np.asarray(enc_other(b, l)[0])) for b, l in zip(bl, ll)]
    enc2_s = 1e18
    other_total = 0
    for _ in range(REPS):
        t0 = time.perf_counter()
        sums = [enc_other(b, l) for b, l in zip(bl, ll)]
        other_total = sum(int(np.asarray(s[1])) for s in sums)
        enc2_s = min(enc2_s, time.perf_counter() - t0)

    _log("fetch compressed")
    with timer.stage("fetch+host-assemble"):
        comp_np, totals_np = [], []
        for b, l in zip(bl, ll):
            c, t = enc(b, l)
            comp_np.append(np.asarray(c))
            totals_np.append(np.asarray(t))
        comp_np = np.concatenate(comp_np)[:B]
        totals_np = np.concatenate(totals_np)[:B]
        if cpu.available:  # the production host assembly path
            _ = cpu.compact(comp_np, totals_np)
    ratio = data.size / max(int(totals_np.sum()), 1)

    with timer.stage("stage-decode-input"):
        tl = np.zeros(pad_B, np.int32)
        tl[:B] = totals_np
        padded = np.zeros((pad_B, C.MAX_COMPRESSED_BLOCK_SIZE), dtype=np.uint8)
        padded[:B, : comp_np.shape[1]] = comp_np
        pcl = [jax.device_put(jnp.asarray(padded[i * CHUNK : (i + 1) * CHUNK])) for i in range(nch)]
        tll = [jax.device_put(jnp.asarray(tl[i * CHUNK : (i + 1) * CHUNK])) for i in range(nch)]
        _ = [int(np.asarray(jnp.sum(p[..., ::997].astype(jnp.int32)))) for p in pcl]

    _log("warmup decode")
    _ = [int(np.asarray(dec_timed(p, t, l))) for p, t, l in zip(pcl, tll, ll)]
    _log("timing decode")
    dec_s = 1e18
    for _ in range(REPS):
        t0 = time.perf_counter()
        sums = [dec_timed(p, t, l) for p, t, l in zip(pcl, tll, ll)]
        _ = [int(np.asarray(s)) for s in sums]
        dec_s = min(dec_s, time.perf_counter() - t0)

    _log("verify roundtrip")
    with timer.stage("verify"):
        out_np, ok_np = [], []
        for p, t, l in zip(pcl, tll, ll):
            o, ok = decode_blocks_vm(p, t, l)
            out_np.append(np.asarray(o))
            ok_np.append(np.asarray(ok))
        out_np = np.concatenate(out_np)[:B]
        ok_np = np.concatenate(ok_np)[:B]
        assert bool(ok_np.all()), "decode flagged corrupt blocks"
        rec = np.concatenate([out_np[i, : lens_np[i]] for i in range(B)])
        assert np.array_equal(rec, data), "round trip mismatch"

    if PROFILE:
        _log("stage breakdown (untimed phases):\n" + timer.report())

    gb = data.size / 1e9
    result = {
        "metric": "encode+decode GB/s per chip (mixed corpus, round-trip verified)",
        "value": round(gb / (enc_s + dec_s), 4),
        "unit": "GB/s",
        "vs_baseline": round(gb / (enc_s + dec_s) * 1000 / _REF_COMBINED_MBPS, 2),
        "encode_gbps": round(gb / enc_s, 4),
        "decode_gbps": round(gb / dec_s, 4),
        "ratio": round(ratio, 4),
        "profile": "dense" if dense else "fast",
        "companion_profile": "fast" if dense else "dense",
        "companion_encode_gbps": round(gb / enc2_s, 4),
        "companion_ratio": round(data.size / max(other_total, 1), 4),
        "input_mb": BENCH_MB,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
