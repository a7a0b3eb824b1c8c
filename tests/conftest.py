"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
tests run without TPU hardware.  Must run before jax is imported anywhere."""

import os

# The sandbox environment pins JAX_PLATFORMS=axon (a tunneled remote TPU);
# tests must run on a local virtual 8-device CPU mesh, so force the platform
# both via env (for subprocesses) and jax.config (which wins over the
# already-initialized axon plugin registration).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: the batch codec jits are expensive to build
# (hundreds of 64k-wide fused ops); cache them across test runs/processes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-snappytpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SRC = "/root/reference/src"
REF_BUILD = "/tmp/refsnappy"


def _build_reference_cli() -> str | None:
    """Compile the reference C codec (out of repo, in /tmp) as a test oracle.

    We never copy this code into our tree; we only build and run it to
    cross-validate wire compatibility, per SURVEY.md §4.
    """
    exe = os.path.join(REF_BUILD, "snappy")
    if os.path.exists(exe):
        return exe
    if not os.path.isdir(REF_SRC):
        return None
    os.makedirs(REF_BUILD, exist_ok=True)
    sources = [
        "cmd.c",
        "snappy_compression.c",
        "snappy_compression_tree.c",
        "snappy_decompression.c",
        "varint.c",
        "buffer_compression.c",
        "BST.c",
        "IO_utils.c",
        "result.c",
    ]
    cmd = ["gcc", "-O2", "-std=c99", "-o", exe] + [
        os.path.join(REF_SRC, s) for s in sources
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            return None
    except Exception:
        return None
    return exe if os.path.exists(exe) else None


@pytest.fixture(scope="session")
def reference_cli():
    exe = _build_reference_cli()
    if exe is None:
        pytest.skip("reference C binary unavailable")
    return exe
