"""Shard manifests: idempotent reruns, failure detection, ordered assembly."""

import json
import os

import numpy as np

from snappytpu.bench import corpus
from snappytpu.model import decompress
from snappytpu.stream import manifest


def _np_encode_fn(blocks, lens):
    """Model-codec encode_fn so these tests stay fast on CPU."""
    from snappytpu.format import constants as C
    from snappytpu.model import encode_block

    comp = np.zeros((blocks.shape[0], C.MAX_COMPRESSED_BLOCK_SIZE), np.uint8)
    totals = np.zeros(blocks.shape[0], np.int32)
    for i in range(blocks.shape[0]):
        b = encode_block(blocks[i, : lens[i]])
        comp[i, : len(b)] = np.frombuffer(b, np.uint8)
        totals[i] = len(b)
    return comp, totals


def test_shard_sweep_assemble_roundtrip(tmp_path):
    data = np.frombuffer(corpus.mixed(5 * 65536 + 321, seed=31), np.uint8)
    n_shards = 3
    for s in range(n_shards):
        manifest.encode_shard(data, str(tmp_path), s, n_shards, _np_encode_fn)
    assert manifest.missing_shards(str(tmp_path), n_shards) == []
    out = tmp_path / "full.snappy"
    total = manifest.assemble(str(tmp_path), n_shards, str(out))
    assert total == data.size
    assert decompress(out.read_bytes()) == data.tobytes()


def test_idempotent_rerun(tmp_path):
    data = np.frombuffer(corpus.text(3 * 65536), np.uint8)
    m1 = manifest.encode_shard(data, str(tmp_path), 0, 2, _np_encode_fn)
    part = tmp_path / "shard_00000.snappy_part"
    mtime = os.path.getmtime(part)
    m2 = manifest.encode_shard(data, str(tmp_path), 0, 2, _np_encode_fn)
    assert m1 == m2
    assert os.path.getmtime(part) == mtime  # nothing rewritten


def test_changed_input_recomputes(tmp_path):
    data = np.frombuffer(corpus.text(2 * 65536), np.uint8)
    manifest.encode_shard(data, str(tmp_path), 0, 1, _np_encode_fn)
    data2 = np.frombuffer(corpus.text(2 * 65536, seed=99), np.uint8)
    m = manifest.encode_shard(data2, str(tmp_path), 0, 1, _np_encode_fn)
    assert m["input_sha256"] != ""
    out = tmp_path / "full.snappy"
    manifest.assemble(str(tmp_path), 1, str(out))
    assert decompress(out.read_bytes()) == data2.tobytes()


def test_missing_shard_detected(tmp_path):
    data = np.frombuffer(corpus.text(4 * 65536), np.uint8)
    manifest.encode_shard(data, str(tmp_path), 0, 3, _np_encode_fn)
    manifest.encode_shard(data, str(tmp_path), 2, 3, _np_encode_fn)
    assert manifest.missing_shards(str(tmp_path), 3) == [1]
    # corrupt manifest counts as missing
    mp = tmp_path / "shard_00000.json"
    mp.write_text(json.dumps({"complete": False}))
    assert 0 in manifest.missing_shards(str(tmp_path), 3)


def test_default_encoder_matches_api_compress(tmp_path):
    """The default (production) shard encoder yields the SAME bytes as
    api.compress: a manifest-assembled multi-shard stream must be
    byte-identical to the single-host stream (one production encoder
    everywhere, SURVEY.md §5.4/§5.8)."""
    from snappytpu import api

    data = np.frombuffer(corpus.mixed(4 * 65536 + 777, seed=77), np.uint8)
    n_shards = 2
    for s in range(n_shards):
        manifest.encode_shard(data, str(tmp_path), s, n_shards)  # default fn
    out = tmp_path / "full.snappy"
    manifest.assemble(str(tmp_path), n_shards, str(out))
    assert out.read_bytes() == api.compress(data.tobytes())
