"""Wire-format compatibility against the reference C codec, rebuilt from
source in /tmp (never copied into this tree).  Contracts, all exercised on
the PRODUCTION device path (snappytpu.api -> encode_v2 + decode_vm):

1. the device decoder bit-exactly decodes reference-compressed streams
   (both its hash-table `-c` and BST `-b` compressors),
2. the reference decoder (`-d`) bit-exactly decodes device-encoded streams,
3. the device encoder's compressed size is <= the reference's best on every
   fixture AND on real files from the reference checkout — strict, no slack
   (BASELINE.json: "at <= its compressed size").

The numpy model codec keeps its own row in contract 1 as the executable-spec
cross-check.
"""

import os
import subprocess
import tempfile

import pytest

from snappytpu import api
from snappytpu.bench import corpus
from snappytpu.model import decompress as model_decompress

FIXTURES = {
    k: v
    for k, v in corpus.edge_case_corpus().items()
    # reference cannot round-trip a 0-byte file cleanly in all modes; it is
    # covered by our own tests
    if k != "empty"
}

# real files from the reference checkout (SURVEY.md §4 fixture realism);
# capped so the CPU test mesh stays fast — the bench sweep covers full sizes
REAL_FILES = {
    name: data[:262144]
    for name, data in sorted(corpus.reference_files().items())[:6]
    if len(data) > 1024
}


def _run_ref(exe, flag, src, dst):
    r = subprocess.run(
        [exe, flag, src, dst], capture_output=True, timeout=300, cwd=os.path.dirname(exe)
    )
    assert r.returncode == 0, r.stderr.decode(errors="replace")


def _ref_compress_size(exe, data: bytes) -> int:
    with tempfile.TemporaryDirectory() as d:
        src, comp = os.path.join(d, "in"), os.path.join(d, "out")
        with open(src, "wb") as f:
            f.write(data)
        best = None
        for flag in ("-c", "-b"):
            _run_ref(exe, flag, src, comp)
            size = os.path.getsize(comp)
            best = size if best is None else min(best, size)
    return best


@pytest.mark.parametrize("name", sorted(FIXTURES))
@pytest.mark.parametrize("flag", ["-c", "-b"])
def test_decode_reference_streams(reference_cli, name, flag):
    data = FIXTURES[name]
    with tempfile.TemporaryDirectory() as d:
        src, comp = os.path.join(d, "in"), os.path.join(d, "out")
        with open(src, "wb") as f:
            f.write(data)
        _run_ref(reference_cli, flag, src, comp)
        with open(comp, "rb") as f:
            ref_comp = f.read()
    assert api.decompress(ref_comp) == data          # device path
    assert model_decompress(ref_comp) == data        # executable spec


@pytest.mark.parametrize("name", sorted(FIXTURES))
@pytest.mark.parametrize("profile", ["dense", "fast"])
def test_reference_decodes_our_streams(reference_cli, name, profile):
    data = FIXTURES[name]
    ours = api.compress(data, profile=profile)
    with tempfile.TemporaryDirectory() as d:
        comp, out = os.path.join(d, "comp"), os.path.join(d, "out")
        with open(comp, "wb") as f:
            f.write(ours)
        _run_ref(reference_cli, "-d", comp, out)
        with open(out, "rb") as f:
            decoded = f.read()
    assert decoded == data


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_compressed_size_at_most_reference(reference_cli, name):
    data = FIXTURES[name]
    ours = len(api.compress(data))
    best = _ref_compress_size(reference_cli, data)
    assert ours <= best, f"{name}: ours {ours} > reference {best}"


@pytest.mark.parametrize("name", sorted(REAL_FILES))
def test_compressed_size_at_most_reference_real_files(reference_cli, name):
    data = REAL_FILES[name]
    ours = len(api.compress(data))
    best = _ref_compress_size(reference_cli, data)
    assert ours <= best, f"{name}: ours {ours} > reference {best}"
    assert api.decompress(api.compress(data)) == data
