"""Wire-format compatibility against the reference C codec, rebuilt from
source in /tmp (never copied into this tree).  Three contracts:

1. our decoder bit-exactly decodes reference-compressed streams (both its
   hash-table `-c` and BST `-b` compressors),
2. the reference decoder (`-d`) bit-exactly decodes our streams,
3. our compressed size is <= the reference's on every fixture
   (BASELINE.json: "at <= its compressed size").
"""

import os
import subprocess
import tempfile

import pytest

from snappytpu.bench import corpus
from snappytpu.model import compress, decompress

FIXTURES = {
    k: v
    for k, v in corpus.edge_case_corpus().items()
    # reference cannot round-trip a 0-byte file cleanly in all modes; it is
    # covered by our own tests
    if k != "empty"
}


def _run_ref(exe, flag, src, dst):
    r = subprocess.run(
        [exe, flag, src, dst], capture_output=True, timeout=300, cwd=os.path.dirname(exe)
    )
    assert r.returncode == 0, r.stderr.decode(errors="replace")


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
    assert decompress(ref_comp) == data


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_reference_decodes_our_streams(reference_cli, name):
    data = FIXTURES[name]
    ours = compress(data)
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
    ours = len(compress(data))
    with tempfile.TemporaryDirectory() as d:
        src, comp = os.path.join(d, "in"), os.path.join(d, "out")
        with open(src, "wb") as f:
            f.write(data)
        best = None
        for flag in ("-c", "-b"):
            _run_ref(reference_cli, flag, src, comp)
            size = os.path.getsize(comp)
            best = size if best is None else min(best, size)
    assert ours <= best, f"{name}: ours {ours} > reference {best}"
