"""Golden wire vectors: cross-validation against google/snappy (SURVEY.md §4).

The fixtures in tests/golden/ are (input, compressed) pairs produced by
google/snappy (vendored via tests/golden/generate.py, which uses pyarrow's
bundled codec).  Every decoder in this repo must reproduce the input from the
google-compressed stream bit-exactly, and google/snappy must decode every
stream our encoders produce — interop in both directions.
"""

import glob
import os

import numpy as np
import pytest

from snappytpu import api
from snappytpu.format.varint import decode_varint
from snappytpu.model.decode import decompress as model_decompress

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
NAMES = sorted(
    os.path.basename(p)[: -len(".snappy")]
    for p in glob.glob(os.path.join(GOLDEN, "*.snappy"))
)

try:
    import pyarrow as pa

    _SNAPPY = pa.Codec("snappy")
except Exception:  # pragma: no cover - pyarrow is in the image
    _SNAPPY = None


def _pair(name):
    with open(os.path.join(GOLDEN, f"{name}.raw"), "rb") as f:
        raw = f.read()
    with open(os.path.join(GOLDEN, f"{name}.snappy"), "rb") as f:
        comp = f.read()
    return raw, comp


def test_fixtures_exist():
    assert len(NAMES) >= 8, "golden fixture set missing — run tests/golden/generate.py"


@pytest.mark.parametrize("name", NAMES)
def test_model_decoder_reads_google_streams(name):
    raw, comp = _pair(name)
    out = model_decompress(np.frombuffer(comp, np.uint8))
    out = out if isinstance(out, bytes) else out.tobytes()
    assert out == raw


@pytest.mark.parametrize("name", NAMES)
def test_device_decoder_reads_google_streams(name):
    raw, comp = _pair(name)
    assert api.decompress(comp) == raw


@pytest.mark.parametrize("name", NAMES)
def test_native_decoder_reads_google_streams(name):
    from snappytpu import cpu

    if not cpu.available:
        pytest.skip("native runtime unavailable")
    raw, comp = _pair(name)
    assert cpu.decompress(comp) == raw


@pytest.mark.parametrize("name", NAMES)
@pytest.mark.parametrize("profile", ["dense", "fast"])
def test_google_snappy_reads_our_streams(name, profile):
    if _SNAPPY is None:
        pytest.skip("pyarrow snappy unavailable")
    raw, _ = _pair(name)
    ours = api.compress(raw, profile=profile)
    assert bytes(_SNAPPY.decompress(ours, len(raw))) == raw


@pytest.mark.parametrize("name", NAMES)
def test_preamble_matches_google(name):
    raw, comp = _pair(name)
    total, start = decode_varint(np.frombuffer(comp, np.uint8))
    assert total == len(raw)
    ours = api.compress(raw)
    assert ours[:start] == comp[:start]
