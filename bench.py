"""Benchmark runner: encode + decode GB/s per chip (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}

vs_baseline compares against the reference C codec's measured 1 MB numbers
(BASELINE.md: 58.7 MB/s encode, 134.6 MB/s decode -> 40.9 MB/s combined
encode+decode throughput on one CPU core).
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


def main():
    import jax

    data = np.frombuffer(corpus.mixed(BENCH_MB << 20, seed=42), np.uint8)
    blocks_np, lens_np = framing.pack_blocks(data)
    B = blocks_np.shape[0]
    blocks = jax.device_put(jax.numpy.asarray(blocks_np))
    lens = jax.device_put(jax.numpy.asarray(lens_np))

    # --- encode ---
    # NOTE: on the tunneled TPU runtime, block_until_ready can return before
    # execution finishes; a scalar device->host fetch is the only honest
    # completion barrier, so each rep fetches a reduction of its outputs.
    comp, totals = encode_blocks(blocks, lens)  # warmup/compile
    _ = int(np.asarray(jax.numpy.sum(totals)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        comp, totals = encode_blocks(blocks, lens)
        _ = int(np.asarray(jax.numpy.sum(totals) + jax.numpy.sum(comp[:, ::997].astype(jax.numpy.int32))))
    enc_s = (time.perf_counter() - t0) / REPS

    comp_np, totals_np = np.asarray(comp), np.asarray(totals)
    ratio = data.size / max(int(totals_np.sum()) + 1, 1)

    # --- decode (device-resident padded chunks) ---
    padded = np.zeros((B, C.MAX_COMPRESSED_BLOCK_SIZE), dtype=np.uint8)
    for i in range(B):
        padded[i, : totals_np[i]] = comp_np[i, : totals_np[i]]
    pc = jax.device_put(jax.numpy.asarray(padded))
    pl = jax.device_put(jax.numpy.asarray(totals_np))
    ol = lens
    out, ok = decode_blocks(pc, pl, ol)  # warmup/compile
    _ = int(np.asarray(jax.numpy.sum(ok.astype(jax.numpy.int32))))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out, ok = decode_blocks(pc, pl, ol)
        _ = int(np.asarray(jax.numpy.sum(ok.astype(jax.numpy.int32)) + jax.numpy.sum(out[:, ::997].astype(jax.numpy.int32))))
    dec_s = (time.perf_counter() - t0) / REPS

    assert bool(np.asarray(ok).all()), "decode flagged corrupt blocks"
    out_np = np.asarray(out)
    rec = np.concatenate([out_np[i, : lens_np[i]] for i in range(B)])
    assert np.array_equal(rec, data), "round trip mismatch"

    gb = data.size / 1e9
    enc_gbps = gb / enc_s
    dec_gbps = gb / dec_s
    combined = gb / (enc_s + dec_s)
    result = {
        "metric": "encode+decode GB/s per chip (mixed corpus, round-trip verified)",
        "value": round(combined, 4),
        "unit": "GB/s",
        "vs_baseline": round(combined * 1000 / _REF_COMBINED_MBPS, 2),
        "encode_gbps": round(enc_gbps, 4),
        "decode_gbps": round(dec_gbps, 4),
        "ratio": round(ratio, 4),
        "input_mb": BENCH_MB,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
