"""CLI and metrics layer: reference flag compatibility, CSV schema, oracle."""

import csv
import os
import subprocess
import sys

import pytest

from snappytpu.bench import corpus
from snappytpu.bench.metrics import Result, compare_files, write_result_csv

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cli(*argv, timeout=600):
    return subprocess.run(
        [sys.executable, "-m", "snappytpu.cli", *argv],
        capture_output=True, timeout=timeout, env=ENV, text=True,
    )


def test_cli_reference_flags_roundtrip(tmp_path):
    src = tmp_path / "in"
    comp = tmp_path / "comp"
    out = tmp_path / "out"
    src.write_bytes(corpus.text(30_000))
    r = _cli("-c", str(src), str(comp), "--backend", "model")
    assert r.returncode == 0, r.stderr
    r = _cli("-d", "-r", str(comp), str(out), "--backend", "model")
    assert r.returncode == 0, r.stderr
    assert "speed" in r.stdout
    assert out.read_bytes() == src.read_bytes()


def test_cli_cpu_backend_and_csv(tmp_path):
    src = tmp_path / "in"
    comp = tmp_path / "comp"
    csvf = tmp_path / "results.csv"
    src.write_bytes(corpus.mixed(80_000, seed=2))
    r = _cli("-b", "-r", str(src), str(comp), "--backend", "cpu", "--csv", str(csvf))
    assert r.returncode == 0, r.stderr
    rows = list(csv.DictReader(open(csvf)))
    assert len(rows) == 1
    assert rows[0]["phase"] == "compress"
    assert int(rows[0]["input_size"]) == 80_000
    assert float(rows[0]["comp_ratio"]) > 1.0


def test_cli_roundtrip_verb(tmp_path):
    src = tmp_path / "in"
    src.write_bytes(corpus.low_entropy(50_000))
    r = _cli("roundtrip", str(src), "--backend", "cpu")
    assert r.returncode == 0, r.stderr
    assert "roundtrip ok" in r.stdout


def test_compare_files_catches_truncation(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.write_bytes(b"hello world")
    b.write_bytes(b"hello")  # prefix: the reference oracle would PASS this
    assert compare_files(str(a), str(b)) > 0
    b.write_bytes(b"hello world")
    assert compare_files(str(a), str(b)) == 0


def test_result_speed_convention():
    r = Result(phase="compress", input_size=2_000_000, output_size=1_000_000, time_taken=1.0)
    assert abs(r.speed_mbps - 2.0) < 1e-9
    assert abs(r.comp_ratio - 2.0) < 1e-9
