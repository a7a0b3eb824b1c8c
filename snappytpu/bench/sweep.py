"""Benchmark sweeps producing reference-style CSV series.

The reference's Test_results/ holds 4 repeated-run CSV series (hash, alt,
BST compressors and decompression) over a 500 B..1 MB size grid
(snappy_test.c:7, result.c:67-95).  This module reproduces that shape for any
backend/profile so new numbers are directly comparable, and adds the mesh
configs from BASELINE.json.

Run: python -m snappytpu.bench.sweep --backend cpu --out Test_results_tpu/
"""

from __future__ import annotations

import argparse
import os
import time

from . import corpus
from .metrics import Result, write_result_csv

SIZES = [500, 1000, 5000, 10000, 50000, 100000, 500000, 1000000]


def _codec(backend: str, profile: str):
    if backend == "device":
        import functools

        from .. import api

        return functools.partial(api.compress, profile=profile), api.decompress
    if backend == "cpu":
        from .. import cpu

        assert cpu.available, "native backend unavailable"
        return cpu.compress, cpu.decompress
    from .. import model

    return model.compress, model.decompress


def run_sweep(backend: str = "cpu", profile: str = "dense", reps: int = 5,
              out_dir: str = "Test_results_tpu", sizes=SIZES,
              n_chips: int = 1, n_hosts: int = 1) -> list[Result]:
    os.makedirs(out_dir, exist_ok=True)
    compress, decompress = _codec(backend, profile)
    comp_csv = os.path.join(out_dir, f"compression_results_{backend}_{profile}.csv")
    dec_csv = os.path.join(out_dir, f"decompression_results_{backend}.csv")
    results = []
    for size in sizes:
        data = corpus.mixed(size, seed=size)
        comp = compress(data)  # warm (compiles on device backend)
        best_c = None
        for _ in range(reps):
            t0 = time.perf_counter()
            comp = compress(data)
            dt = time.perf_counter() - t0
            best_c = dt if best_c is None else min(best_c, dt)
        r = Result("compress", size, len(comp), best_c, backend, n_chips, n_hosts)
        write_result_csv(comp_csv, r)
        results.append(r)

        out = decompress(comp)
        assert out == data, f"round trip mismatch at size {size}"
        best_d = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = decompress(comp)
            dt = time.perf_counter() - t0
            best_d = dt if best_d is None else min(best_d, dt)
        r = Result("decompress", len(comp), size, best_d, backend, n_chips, n_hosts)
        write_result_csv(dec_csv, r)
        results.append(r)
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backend", default="cpu", choices=["device", "cpu", "model"])
    p.add_argument("--profile", default="dense", choices=["dense", "fast"])
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out", default="Test_results_tpu")
    args = p.parse_args(argv)
    for r in run_sweep(args.backend, args.profile, args.reps, args.out):
        print(r.report())
        print()


if __name__ == "__main__":
    main()
