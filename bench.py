"""Benchmark runner: encode + decode GB/s per chip (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

Headline corpus (round 4+): the 128 MB Silesia stand-in — tiled real files
from the reference checkout plus synthetic text/binary/runs segments
(snappytpu/bench/corpus.py:silesia_standin) — matching BASELINE config 3's
intent (a large mixed corpus; the true Silesia archive is unreachable from
this sandbox, documented in README.md).  vs_baseline compares against the
reference C codec's measured 1 MB numbers (BASELINE.md: 58.7 MB/s encode,
134.6 MB/s decode -> 40.9 MB/s combined on one CPU core).

Measurement methodology (this target is a TUNNELED TPU):
  * block_until_ready can return before execution finishes, so every timed
    call is a jit wrapper that reduces its outputs to a few scalars and the
    timer fetches them to host — the honest completion barrier;
  * one dispatch+fetch round trip costs ~15-30 ms, so work is queued as
    128-block batches and the scalars are fetched once per rep;
  * data stays DEVICE-RESIDENT end to end: the compressed batches feed the
    decoder without a host round trip, and the round trip is verified by a
    device-side block-exact comparison — host<->device transfers over the
    tunnel run at ~0.5 MB/s (three orders of magnitude below real PCIe)
    and would otherwise dominate wall time without being chip work.

SNAPPYTPU_BENCH_MB       total input size (default 128)
SNAPPYTPU_BENCH_REPS     timing repetitions (default 5)
SNAPPYTPU_BENCH_CORPUS   silesia (default) | mixed  (mixed = rounds 1-3's
                         32 MB headline corpus, kept for comparability)
SNAPPYTPU_BENCH_DENSE=1  make dense the headline profile (fast default)
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

from snappytpu.bench import corpus  # noqa: E402
from snappytpu.format import constants as C  # noqa: E402

# reference combined enc+dec MB/s at 1 MB (BASELINE.md)
_REF_COMBINED_MBPS = 1.0 / (1.0 / 58.7 + 1.0 / 134.6)

WHICH = os.environ.get("SNAPPYTPU_BENCH_CORPUS", "silesia")
BENCH_MB = int(os.environ.get("SNAPPYTPU_BENCH_MB", "128" if WHICH == "silesia" else "32"))
REPS = int(os.environ.get("SNAPPYTPU_BENCH_REPS", "5"))
CHUNK = 128  # blocks per device dispatch (8 MiB input).  Dispatch overhead
# (~23 ms/call over this tunnel) hides under queued compute, so larger
# dispatch groups measured NO gain (PROFILE.md r5) — 128 keeps compiles fast.


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _measure(which, bench_mb, reps, dense):
    import jax
    import jax.numpy as jnp

    from snappytpu.kernels.decode_vm import decode_blocks_vm
    from snappytpu.kernels.encode_v2 import encode_block_core
    from snappytpu.stream import framing

    t_start = time.time()
    if which == "silesia":
        raw = corpus.silesia_standin(bench_mb << 20)[: bench_mb << 20]
    else:
        raw = corpus.mixed(bench_mb << 20, seed=42)
    data = np.frombuffer(raw, np.uint8)
    blocks_np, lens_np = framing.pack_blocks(data)
    B = blocks_np.shape[0]
    nch = (B + CHUNK - 1) // CHUNK
    pad_B = nch * CHUNK
    bp = np.zeros((pad_B, C.MAX_BLOCK_SIZE), np.uint8)
    lp = np.zeros(pad_B, np.int32)
    bp[:B], lp[:B] = blocks_np, lens_np

    _log(f"staging {bench_mb} MB ({nch} batches) — slow over the tunnel")
    bl = [jax.device_put(jnp.asarray(bp[i * CHUNK : (i + 1) * CHUNK])) for i in range(nch)]
    ll = [jax.device_put(jnp.asarray(lp[i * CHUNK : (i + 1) * CHUNK])) for i in range(nch)]
    _ = [int(np.asarray(jnp.sum(b[..., ::997].astype(jnp.int32)))) for b in bl]
    _log(f"staged in {time.time()-t_start:.0f}s")

    @jax.jit
    def enc_timed(b, l):
        comp, totals = encode_block_core(b, l, dense)
        return jnp.sum(totals) + jnp.sum(comp[:, ::997].astype(jnp.int32))

    _log("warmup encode")
    _ = [int(np.asarray(enc_timed(b, l))) for b, l in zip(bl, ll)]
    _log("timing encode")
    enc_s = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        sums = [enc_timed(b, l) for b, l in zip(bl, ll)]
        _ = [int(np.asarray(s)) for s in sums]
        enc_s = min(enc_s, time.perf_counter() - t0)

    @jax.jit
    def enc_other(b, l):
        comp, totals = encode_block_core(b, l, not dense)
        return jnp.sum(totals) + jnp.sum(comp[:, ::997].astype(jnp.int32)), jnp.sum(totals)

    _log("timing companion-profile encode")
    _ = [int(np.asarray(enc_other(b, l)[0])) for b, l in zip(bl, ll)]
    enc2_s = 1e18
    other_total = 0
    for _ in range(reps):
        t0 = time.perf_counter()
        sums = [enc_other(b, l) for b, l in zip(bl, ll)]
        other_total = sum(int(np.asarray(s[1])) for s in sums)
        enc2_s = min(enc2_s, time.perf_counter() - t0)

    # ---- device-resident handoff to decode (no tunnel round trip) ----
    _log("encode for decode input (device-resident)")

    @jax.jit
    def enc_keep(b, l):
        return encode_block_core(b, l, dense)

    comp_dev = [enc_keep(b, l) for b, l in zip(bl, ll)]
    totals_sum = sum(int(np.asarray(jnp.sum(t))) for _c, t in comp_dev)
    ratio = data.size / max(totals_sum, 1)

    dec_in = [(c, t, l, b) for (c, t), l, b in zip(comp_dev, ll, bl)]

    @jax.jit
    def dec_timed(c, t, l):
        out, ok = decode_blocks_vm(c, t, l)
        return jnp.sum(ok.astype(jnp.int32)) + jnp.sum(out[:, ::997].astype(jnp.int32))

    _log("warmup decode")
    _ = [int(np.asarray(dec_timed(c, t, l))) for c, t, l, _b in dec_in]
    _log("timing decode")
    dec_s = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        sums = [dec_timed(c, t, l) for c, t, l, _b in dec_in]
        _ = [int(np.asarray(s)) for s in sums]
        dec_s = min(dec_s, time.perf_counter() - t0)

    _log("verify roundtrip (device-side block-exact comparison)")

    @jax.jit
    def dec_verify(c, t, l, ref_blocks):
        out, ok = decode_blocks_vm(c, t, l)
        match = jnp.sum((out == ref_blocks).all(axis=1).astype(jnp.int32))
        return jnp.sum(ok.astype(jnp.int32)), match

    okc = mc = 0
    for c, t, l, b in dec_in:
        o = dec_verify(c, t, l, b)
        okc += int(np.asarray(o[0]))
        mc += int(np.asarray(o[1]))
    assert okc == pad_B, f"decode flagged {pad_B - okc} blocks corrupt"
    assert mc == pad_B, f"round trip mismatch on {pad_B - mc} blocks"

    gb = data.size / 1e9
    return {
        "value": round(gb / (enc_s + dec_s), 4),
        "vs_baseline": round(gb / (enc_s + dec_s) * 1000 / _REF_COMBINED_MBPS, 2),
        "encode_gbps": round(gb / enc_s, 4),
        "decode_gbps": round(gb / dec_s, 4),
        "ratio": round(ratio, 4),
        "companion_encode_gbps": round(gb / enc2_s, 4),
        "companion_ratio": round(data.size / max(other_total, 1), 4),
        "backend": jax.default_backend(),
    }


def main():
    # Headline profile: "fast" (the analog of the reference's benchmarked
    # hash compressor; its corpus-aggregate ratio exceeds the reference's —
    # a tested contract).  The "dense" profile (strict <=-reference size
    # per fixture) is measured as the companion in the same run.
    dense = os.environ.get("SNAPPYTPU_BENCH_DENSE", "0") == "1"
    r = _measure(WHICH, BENCH_MB, REPS, dense)
    result = {
        "metric": "encode+decode GB/s per chip "
                  f"({f'{BENCH_MB} MB silesia stand-in' if WHICH == 'silesia' else 'mixed corpus'}, "
                  "round-trip verified)",
        "value": r["value"],
        "unit": "GB/s",
        "vs_baseline": r["vs_baseline"],
        "encode_gbps": r["encode_gbps"],
        "decode_gbps": r["decode_gbps"],
        "ratio": r["ratio"],
        "profile": "dense" if dense else "fast",
        "companion_profile": "fast" if dense else "dense",
        "companion_encode_gbps": r["companion_encode_gbps"],
        "companion_ratio": r["companion_ratio"],
        "input_mb": BENCH_MB,
        "corpus": WHICH,
        "backend": r["backend"],
        "reps": REPS,
    }
    # vs_host_reference: the rebuilt reference C binary (-O2) timed on THIS
    # host on the same corpus (tools/ref_host_bench.py writes the summary);
    # vs_baseline stays pinned to BASELINE.md for round-over-round comparability.
    refhost = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "Test_results_tpu", "refhost_summary.json")
    if os.path.exists(refhost):
        with open(refhost) as f:
            rh = json.load(f)
        key = "combined_mbps_silesia128" if WHICH == "silesia" else "combined_mbps_mixed32"
        if key in rh:
            result["vs_host_reference"] = round(r["value"] * 1000 / rh[key], 2)
            result["host_reference_mbps"] = rh[key]
    # cross-round comparability: rounds 1-3's headline was the 32 MB mixed
    # corpus — measure it in the same run and report alongside
    if WHICH == "silesia" and os.environ.get("SNAPPYTPU_BENCH_COMPANION32", "1") == "1":
        _log("companion run: 32 MB mixed corpus (rounds 1-3 headline)")
        m = _measure("mixed", 32, REPS, dense)
        result["mixed32_gbps"] = m["value"]
        result["mixed32_vs_baseline"] = m["vs_baseline"]
        result["mixed32_encode_gbps"] = m["encode_gbps"]
        result["mixed32_decode_gbps"] = m["decode_gbps"]
        result["mixed32_ratio"] = m["ratio"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
