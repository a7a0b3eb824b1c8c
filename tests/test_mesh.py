"""Mesh-sharded encode/decode on the virtual 8-device CPU mesh: output bytes
must be identical to single-device results (host-count/device-count
invariance) and order-preserving."""

import jax
import numpy as np
import pytest

from snappytpu.bench import corpus
from snappytpu.format import constants as C
from snappytpu.kernels.encode_v2 import encode_blocks_v2 as encode_blocks
from snappytpu.mesh import decode_mesh, encode_mesh, make_mesh
from snappytpu.stream import framing


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_mesh_encode_matches_single_device(mesh8):
    data = np.frombuffer(corpus.mixed(9 * C.MAX_BLOCK_SIZE + 1234, seed=3), np.uint8)
    blocks, lens = framing.pack_blocks(data)
    comp_m, tot_m = encode_mesh(mesh8, blocks, lens)
    comp_s, tot_s = encode_blocks(blocks, lens)
    comp_s, tot_s = np.asarray(comp_s), np.asarray(tot_s)
    assert (tot_m == tot_s).all()
    for i in range(blocks.shape[0]):
        assert comp_m[i, : tot_m[i]].tobytes() == comp_s[i, : tot_s[i]].tobytes()


def test_mesh_roundtrip_order_preserved(mesh8):
    data = np.frombuffer(corpus.mixed(17 * C.MAX_BLOCK_SIZE, seed=7), np.uint8)
    blocks, lens = framing.pack_blocks(data)
    comp, totals = encode_mesh(mesh8, blocks, lens)
    chunks = [comp[i, : totals[i]] for i in range(comp.shape[0])]
    padded, comp_lens = framing.pad_chunks(chunks)
    out, ok = decode_mesh(mesh8, padded, comp_lens, lens)
    assert ok.all()
    rec = b"".join(out[i, : lens[i]].tobytes() for i in range(out.shape[0]))
    assert rec == data.tobytes()


def test_mesh_uneven_batch(mesh8):
    # 3 blocks over 8 devices: padding blocks must be invisible in output
    data = np.frombuffer(corpus.text(2 * C.MAX_BLOCK_SIZE + 77), np.uint8)
    blocks, lens = framing.pack_blocks(data)
    comp, totals = encode_mesh(mesh8, blocks, lens)
    comp_s, tot_s = encode_blocks(blocks, lens)
    for i in range(blocks.shape[0]):
        assert comp[i, : totals[i]].tobytes() == np.asarray(comp_s)[i, : int(tot_s[i])].tobytes()
