"""Time the rebuilt reference C binary on THIS host (VERDICT r4 demand #4).

BASELINE.md's numbers come from an unspecified Windows machine with no -O
flags (reference makefile:3-13); the suite already rebuilds the binary at
-O2 (tests/conftest.py:37-69) but it had never been timed here.  This tool
measures it wall-clock (subprocess, file-to-file — the binary's only mode,
cmd.c:21-27) on:

  * the 1 MB grid over the four bench corpus shapes (mixed/text/runs/random)
  * the 32 MB mixed corpus (rounds 1-3 headline)
  * the 128 MB Silesia stand-in (round 4+ headline)

and writes:
  * Test_results_tpu/compression_results_refhost.csv   (reference CSV schema
    + corpus/mode columns; speed = MB/s over input bytes, result.c:10-41)
  * Test_results_tpu/decompression_results_refhost.csv
  * Test_results_tpu/refhost_summary.json  (consumed by bench.py for the
    vs_host_reference field)

Files live in /tmp; each timing is min over REPS runs; process startup
(~2-3 ms, measured) is NOT subtracted — it is noise at >=1 MB.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from conftest import _build_reference_cli  # noqa: E402
from snappytpu.bench import corpus  # noqa: E402

REPS_SMALL = 9
REPS_BIG = 3
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "Test_results_tpu")


def timed(exe, flag, src, dst, reps):
    best = 1e18
    for _ in range(reps):
        t0 = time.perf_counter()
        r = subprocess.run([exe, flag, src, dst], capture_output=True,
                           timeout=3600, cwd=os.path.dirname(exe))
        dt = time.perf_counter() - t0
        assert r.returncode == 0, r.stderr.decode(errors="replace")
        best = min(best, dt)
    return best


def main():
    exe = _build_reference_cli()
    assert exe, "reference binary failed to build"
    work = "/tmp/refhost_bench"
    os.makedirs(work, exist_ok=True)

    cases = []  # (name, corpus_tag, bytes)
    for shape, mk in [("mixed", corpus.mixed), ("text", corpus.text),
                      ("runs", corpus.low_entropy), ("random", corpus.random_bytes)]:
        cases.append((f"{shape}_1mb", shape, mk(1 << 20, seed=7), REPS_SMALL))
    cases.append(("mixed_32mb", "mixed", corpus.mixed(32 << 20, seed=42), REPS_BIG))
    cases.append(("silesia_128mb", "silesia",
                  corpus.silesia_standin(128 << 20)[: 128 << 20], REPS_BIG))

    comp_rows, dec_rows = [], []
    summary = {"host": os.uname().nodename, "cc": "gcc -O2 (tests/conftest.py)",
               "timing": "wall clock, min of reps, file-to-file in /tmp"}
    for name, tag, data, reps in cases:
        src = os.path.join(work, name + ".raw")
        with open(src, "wb") as f:
            f.write(data)
        n = len(data)
        per_mode = {}
        for flag, mode in [("-c", "hash"), ("-b", "bst")]:
            dst = os.path.join(work, name + mode + ".sz")
            dt = timed(exe, flag, src, dst, reps)
            csize = os.path.getsize(dst)
            mbps = n / 1e6 / dt
            per_mode[mode] = (dt, csize, mbps)
            comp_rows.append((n, csize, n / csize, dt, mbps, tag, mode, reps))
            print(f"{name:14s} {mode:4s} comp {dt*1e3:9.1f} ms  {mbps:7.1f} MB/s  "
                  f"ratio {n/csize:.3f}", flush=True)
        # decode the -c stream (the reference's benchmarked decompression
        # pairing, result.c:78-95); speed on COMPRESSED basis like result.c,
        # output basis reported alongside
        csrc = os.path.join(work, name + "hash.sz")
        dout = os.path.join(work, name + ".out")
        dt = timed(exe, "-d", csrc, dout, reps)
        csize = os.path.getsize(csrc)
        assert os.path.getsize(dout) == n
        dec_rows.append((csize, n, csize / 1e6 / dt, n / 1e6 / dt, dt, tag, reps))
        print(f"{name:14s}      dec  {dt*1e3:9.1f} ms  {n/1e6/dt:7.1f} MB/s (output basis)",
              flush=True)
        enc_dt = per_mode["hash"][0]
        summary[f"encode_mbps_{name.replace('_1mb','1').replace('_32mb','32').replace('_128mb','128')}"] = round(n / 1e6 / enc_dt, 1)
        summary[f"decode_mbps_{name.replace('_1mb','1').replace('_32mb','32').replace('_128mb','128')}"] = round(n / 1e6 / dt, 1)
        summary[f"combined_mbps_{name.replace('_1mb','1').replace('_32mb','32').replace('_128mb','128')}"] = round(n / 1e6 / (enc_dt + dt), 1)
        os.remove(src)

    with open(os.path.join(OUT, "compression_results_refhost.csv"), "w") as f:
        f.write("input_size,output_size,comp_ratio,time_taken,speed,corpus,mode,reps\n")
        for r in comp_rows:
            f.write(f"{r[0]},{r[1]},{r[2]:.4f},{r[3]:.6f},{r[4]:.2f},{r[5]},{r[6]},{r[7]}\n")
    with open(os.path.join(OUT, "decompression_results_refhost.csv"), "w") as f:
        f.write("input_size,output_size,speed_compressed_basis,speed_output_basis,time_taken,corpus,reps\n")
        for r in dec_rows:
            f.write(f"{r[0]},{r[1]},{r[2]:.2f},{r[3]:.2f},{r[4]:.6f},{r[5]},{r[6]}\n")
    with open(os.path.join(OUT, "refhost_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
