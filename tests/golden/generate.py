"""Generate golden wire vectors with google/snappy (via pyarrow's bundled
codec) — run once and commit the outputs.

Each fixture is a pair `<name>.raw` / `<name>.snappy` where the .snappy file
is the RAW Snappy stream (varint preamble + element stream) exactly as
produced by google/snappy.  These are the external oracle SURVEY.md §4 calls
for: every decoder in this repo must reproduce .raw from .snappy bit-exactly.

Inputs are small, deterministic, and chosen to cover the format corners:
inline/1-byte/2-byte literal headers, COPY1/COPY2, self-overlapping copies,
and >64 KiB streams (google/snappy also emits nothing across 64 KiB block
boundaries, matching the reference C codec's framing).
"""

import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from snappytpu.bench import corpus  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

FIXTURES = {
    "one_byte": b"A",
    "short_text": b"Wikipedia is a free online encyclopedia",
    "repeated_text": b"Wikipedia is a free online encyclopedia " * 40,
    "run_ff": b"\xff" * 3000,
    "period3_overlap": (b"abc" * 2000),
    "alice_like_64k": corpus.text(65536),
    "alice_like_100k": corpus.text(100_000, seed=5),
    "binary_records": corpus.structured_binary(48 * 1024),
    "incompressible_8k": corpus.random_bytes(8192, seed=9),
    "mixed_200k": corpus.mixed(200_000, seed=11),
}


def main():
    codec = pa.Codec("snappy")
    for name, raw in FIXTURES.items():
        comp = bytes(codec.compress(raw))
        # sanity: round-trips through google/snappy itself
        assert bytes(codec.decompress(comp, len(raw))) == raw
        with open(os.path.join(HERE, f"{name}.raw"), "wb") as f:
            f.write(raw)
        with open(os.path.join(HERE, f"{name}.snappy"), "wb") as f:
            f.write(comp)
        print(f"{name}: {len(raw)} -> {len(comp)} bytes")


if __name__ == "__main__":
    main()
