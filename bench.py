"""Benchmark runner: encode + decode GB/s per chip (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

vs_baseline compares against the reference C codec's measured 1 MB numbers
(BASELINE.md: 58.7 MB/s encode, 134.6 MB/s decode -> 40.9 MB/s combined
encode+decode throughput on one CPU core).

Blocks are dispatched in 128-block (8 MiB) chunks — the same unit as
api._MAX_DEVICE_BATCH — which measures ~25% faster than one monolithic
dispatch (smaller live sets keep the sorts in their fast VMEM regime).
On the tunneled TPU runtime, block_until_ready can return before execution
finishes, so each rep ends with a scalar device->host fetch as the honest
completion barrier.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from snappytpu.bench import corpus  # noqa: E402
from snappytpu.format import constants as C  # noqa: E402
from snappytpu.kernels.decode_vm import decode_blocks_vm as decode_blocks  # noqa: E402
from snappytpu.kernels.encode_v2 import encode_blocks_v2 as encode_blocks  # noqa: E402
from snappytpu.stream import framing  # noqa: E402

# reference combined enc+dec MB/s at 1 MB (BASELINE.md)
_REF_COMBINED_MBPS = 1.0 / (1.0 / 58.7 + 1.0 / 134.6)

BENCH_MB = int(os.environ.get("SNAPPYTPU_BENCH_MB", "32"))
REPS = int(os.environ.get("SNAPPYTPU_BENCH_REPS", "3"))
CHUNK = 128  # blocks per device dispatch


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    data = np.frombuffer(corpus.mixed(BENCH_MB << 20, seed=42), np.uint8)
    blocks_np, lens_np = framing.pack_blocks(data)
    B = blocks_np.shape[0]
    nch = (B + CHUNK - 1) // CHUNK
    pad_B = nch * CHUNK
    bp = np.zeros((pad_B, C.MAX_BLOCK_SIZE), np.uint8)
    lp = np.zeros(pad_B, np.int32)
    bp[:B], lp[:B] = blocks_np, lens_np
    bl = [jax.device_put(jnp.asarray(bp[i * CHUNK : (i + 1) * CHUNK])) for i in range(nch)]
    ll = [jax.device_put(jnp.asarray(lp[i * CHUNK : (i + 1) * CHUNK])) for i in range(nch)]

    _log("warmup encode")
    # --- encode ---
    outs = [encode_blocks(b, l) for b, l in zip(bl, ll)]  # warmup/compile
    _ = int(np.asarray(sum(jnp.sum(t) for _, t in outs)))
    _log("timing encode")
    t0 = time.perf_counter()
    for _ in range(REPS):
        outs = [encode_blocks(b, l) for b, l in zip(bl, ll)]
        _ = int(np.asarray(sum(jnp.sum(t) + jnp.sum(c[:, ::997].astype(jnp.int32)) for c, t in outs)))
    enc_s = (time.perf_counter() - t0) / REPS

    _log("fetch compressed")
    comp_np = np.concatenate([np.asarray(c) for c, _ in outs])[:B]
    totals_np = np.concatenate([np.asarray(t) for _, t in outs])[:B]
    ratio = data.size / max(int(totals_np.sum()) + 1, 1)

    # --- decode (device-resident padded chunks) ---
    padded = np.zeros((pad_B, C.MAX_COMPRESSED_BLOCK_SIZE), dtype=np.uint8)
    for i in range(B):
        padded[i, : totals_np[i]] = comp_np[i, : totals_np[i]]
    tl = np.zeros(pad_B, np.int32)
    tl[:B] = totals_np
    pcl = [jax.device_put(jnp.asarray(padded[i * CHUNK : (i + 1) * CHUNK])) for i in range(nch)]
    tll = [jax.device_put(jnp.asarray(tl[i * CHUNK : (i + 1) * CHUNK])) for i in range(nch)]
    _log("warmup decode")
    douts = [decode_blocks(p, t, l) for p, t, l in zip(pcl, tll, ll)]  # warmup
    _ = int(np.asarray(sum(jnp.sum(ok.astype(jnp.int32)) for _, ok in douts)))
    _log("timing decode")
    t0 = time.perf_counter()
    for _ in range(REPS):
        douts = [decode_blocks(p, t, l) for p, t, l in zip(pcl, tll, ll)]
        _ = int(np.asarray(sum(
            jnp.sum(ok.astype(jnp.int32)) + jnp.sum(o[:, ::997].astype(jnp.int32))
            for o, ok in douts
        )))
    dec_s = (time.perf_counter() - t0) / REPS

    _log("verify roundtrip")
    out_np = np.concatenate([np.asarray(o) for o, _ in douts])[:B]
    ok_np = np.concatenate([np.asarray(ok) for _, ok in douts])[:B]
    assert bool(ok_np.all()), "decode flagged corrupt blocks"
    rec = np.concatenate([out_np[i, : lens_np[i]] for i in range(B)])
    assert np.array_equal(rec, data), "round trip mismatch"

    gb = data.size / 1e9
    result = {
        "metric": "encode+decode GB/s per chip (mixed corpus, round-trip verified)",
        "value": round(gb / (enc_s + dec_s), 4),
        "unit": "GB/s",
        "vs_baseline": round(gb / (enc_s + dec_s) * 1000 / _REF_COMBINED_MBPS, 2),
        "encode_gbps": round(gb / enc_s, 4),
        "decode_gbps": round(gb / dec_s, 4),
        "ratio": round(ratio, 4),
        "input_mb": BENCH_MB,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
