"""Microbenchmark the scalar-side primitives that bound the decode VM:
  smem_chase    dependent SMEM load chain (x = smem[x])         — parse floor
  vmem_scalar   dependent scalar VMEM load chain (x = vmem[r,l]) — is it even
                supported, and at what cost vs SMEM?
  alu_chain     dependent scalar ALU chain (baseline issue cost)
  alu_parallel  6 independent scalar ALU chains (dual-issue/ILP headroom)
Each kernel runs N dependent steps inside one grid program; cost/step =
total / N.  Chains are data-dependent on loaded values so nothing folds.
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 200_000
SM = 16384   # SMEM words chased


def _time(fn, *args):
    fn(*args).block_until_ready()
    r = jax.jit(lambda *a: jnp.sum(fn(*a)))
    _ = int(np.asarray(r(*args)))
    best = 1e9
    for _i in range(5):
        t0 = time.perf_counter()
        _ = int(np.asarray(r(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def smem_chase():
    def kernel(tab_ref, out_ref):
        def body(i, x):
            return tab_ref[x]
        x = lax.fori_loop(0, N, body, jnp.int32(0))
        out_ref[0] = jnp.full((8, 128), x, jnp.int32)

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab)
    rng = np.random.default_rng(0)
    perm = rng.permutation(SM).astype(np.int32)
    return _time(run, jnp.asarray(perm))


def vmem_scalar():
    def kernel(tab_ref, out_ref):
        def body(i, x):
            return tab_ref[x >> 7, x & 127]
        x = lax.fori_loop(0, N, body, jnp.int32(0))
        out_ref[0] = jnp.full((8, 128), x, jnp.int32)

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab)
    rng = np.random.default_rng(0)
    perm = rng.permutation(SM).astype(np.int32).reshape(SM // 128, 128)
    return _time(run, jnp.asarray(perm))


def dynrow_chain():
    # dependent dynamic (2,128) row reads: next row index from a lane sum
    def kernel(tab_ref, out_ref):
        def body(i, x):
            pair = tab_ref[pl.ds(x, 2), :]
            return jnp.sum(pair[0:1, :1]).astype(jnp.int32) & 63
        x = lax.fori_loop(0, N // 10, body, jnp.int32(0))
        out_ref[0] = jnp.full((8, 128), x, jnp.int32)

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab)
    rng = np.random.default_rng(0)
    tab = rng.integers(0, 64, (128, 128)).astype(np.int32)
    return _time(run, jnp.asarray(tab)) * 10


def alu_chain(par=1):
    def kernel(seed_ref, out_ref):
        def body(i, xs):
            return tuple((x * 1103515245 + 12345) & 0x7FFFFFFF for x in xs)
        xs = lax.fori_loop(0, N, body, tuple(seed_ref[j] for j in range(par)))
        out_ref[0] = jnp.full((8, 128), sum(xs), jnp.int32)

    @jax.jit
    def run(seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(seed)
    return _time(run, jnp.arange(par, dtype=jnp.int32))


if __name__ == "__main__" and os.environ.get("PROBE1", "1") == "1":
    print(f"backend {jax.default_backend()}", flush=True)
    for name, fn in [("alu_chain(2ops)", alu_chain),
                     ("alu_parallel6", lambda: alu_chain(6)),
                     ("smem_chase", smem_chase),
                     ("vmem_scalar", vmem_scalar),
                     ("dynrow_chain", dynrow_chain)]:
        try:
            s = fn()
            print(f"{name:16s} {s / N * 1e9:8.2f} ns/step", flush=True)
        except Exception as e:
            print(f"{name:16s} FAILED: {str(e)[:300]}", flush=True)


def alu_unroll(u):
    """u dependent ALU steps per fori_loop iteration: isolates the
    per-iteration (branch) overhead from per-step work."""
    def kernel(seed_ref, out_ref):
        def body(i, x):
            for _ in range(u):
                x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            return x
        x = lax.fori_loop(0, N // u, body, seed_ref[0])
        out_ref[0] = jnp.full((8, 128), x, jnp.int32)

    @jax.jit
    def run(seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(seed)
    return _time(run, jnp.arange(1, dtype=jnp.int32))


def smem_unroll(u):
    """u dependent SMEM chase steps per iteration."""
    def kernel(tab_ref, out_ref):
        def body(i, x):
            for _ in range(u):
                x = tab_ref[x]
            return x
        x = lax.fori_loop(0, N // u, body, jnp.int32(0))
        out_ref[0] = jnp.full((8, 128), x, jnp.int32)

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab)
    rng = np.random.default_rng(0)
    perm = rng.permutation(SM).astype(np.int32)
    return _time(run, jnp.asarray(perm))


def while_unroll(u):
    """Same but lax.while_loop with a data-dependent condition (the decode
    VM's actual control structure)."""
    def kernel(tab_ref, out_ref):
        def cond(st):
            i, x = st
            return (i < N // u) & (x >= 0)
        def body(st):
            i, x = st
            for _ in range(u):
                x = tab_ref[x]
            return (i + 1, x)
        _, x = lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
        out_ref[0] = jnp.full((8, 128), x, jnp.int32)

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab)
    rng = np.random.default_rng(0)
    perm = rng.permutation(SM).astype(np.int32)
    return _time(run, jnp.asarray(perm))


def dynrow_noextract(u):
    """u dynamic (2,128) row reads per iteration, addresses from a scalar
    chain (NO vector->scalar extraction): the window-read cost pattern."""
    def kernel(tab_ref, acc_shape_ref, out_ref):
        def body(i, st):
            x, acc = st
            for _ in range(u):
                x = (x * 1103515245 + 12345) & 63
                acc = acc ^ tab_ref[pl.ds(x, 2), :]
            return (x, acc)
        x, acc = lax.fori_loop(0, N // u, body,
                               (jnp.int32(0), jnp.zeros((2, 128), jnp.int32)))
        out_ref[0, 0:2] = acc + x
        out_ref[0, 2:8] = jnp.zeros((6, 128), jnp.int32)

    @jax.jit
    def run(tab, z):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, z)
    rng = np.random.default_rng(0)
    tab = rng.integers(0, 100, (128, 128)).astype(np.int32)
    return _time(run, jnp.asarray(tab), jnp.arange(1, dtype=jnp.int32))


def dynrow_write(u):
    """u dynamic (2,128) row RMWs per iteration to a VMEM scratch."""
    def kernel(seed_ref, out_ref, scr_ref):
        def body(i, x):
            for _ in range(u):
                x = (x * 1103515245 + 12345) & 63
                pair = scr_ref[pl.ds(x, 2), :]
                scr_ref[pl.ds(x, 2), :] = pair ^ x
            return x
        x = lax.fori_loop(0, N // u, body, seed_ref[0])
        out_ref[0, 0:2] = scr_ref[pl.ds(0, 2), :] + x
        out_ref[0, 2:8] = jnp.zeros((6, 128), jnp.int32)

    @jax.jit
    def run(seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.int32)],
        )(seed)
    return _time(run, jnp.arange(1, dtype=jnp.int32))


if __name__ == "__main__" and os.environ.get("PROBE2", "0") == "1":
    print("--- unroll sweeps ---", flush=True)
    for u in (1, 2, 4, 8, 16, 32):
        a = alu_unroll(u)
        s = smem_unroll(u)
        w = while_unroll(u)
        print(f"u={u:3d} alu {a/N*1e9:7.2f}  smem {s/N*1e9:7.2f}  "
              f"while+smem {w/N*1e9:7.2f} ns/step", flush=True)
    for u in (2, 8, 16):
        r = dynrow_noextract(u)
        wr = dynrow_write(u)
        print(f"u={u:3d} dynrow_read {r/N*1e9:7.2f}  dynrow_rmw {wr/N*1e9:7.2f} ns/step", flush=True)


def smem_par(par):
    """par independent SMEM chase chains per iteration."""
    def kernel(tab_ref, out_ref):
        def body(i, xs):
            return tuple(tab_ref[x] for x in xs)
        xs = lax.fori_loop(0, N, body,
                           tuple(jnp.int32(17 * j) for j in range(par)))
        out_ref[0] = jnp.full((8, 128), sum(xs), jnp.int32)

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab)
    rng = np.random.default_rng(0)
    perm = rng.permutation(SM).astype(np.int32)
    return _time(run, jnp.asarray(perm))


def dynrow_par(par, shared=False):
    """par independent (addr-chain + dynamic (2,128) row read) chains, each
    reading its OWN scratch ref (shared=False) or one shared ref."""
    def kernel(seed_ref, out_ref, *scr):
        scr = scr if not shared else (scr[0],) * par
        def body(i, st):
            xs, accs = st
            nxs, naccs = [], []
            for j in range(par):
                x = (xs[j] * 1103515245 + 12345 + j) & 63
                nxs.append(x)
                naccs.append(accs[j] ^ scr[j][pl.ds(x, 2), :])
            return (tuple(nxs), tuple(naccs))
        xs, accs = lax.fori_loop(
            0, N, body,
            (tuple(jnp.int32(j) for j in range(par)),
             tuple(jnp.zeros((2, 128), jnp.int32) for _ in range(par))))
        a = accs[0]
        for j in range(1, par):
            a = a ^ accs[j]
        out_ref[0, 0:2] = a + xs[0]
        out_ref[0, 2:8] = jnp.zeros((6, 128), jnp.int32)

    nscr = 1 if shared else par

    @jax.jit
    def run(seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.int32)
                            for _ in range(nscr)],
        )(seed)
    return _time(run, jnp.arange(1, dtype=jnp.int32))


if __name__ == "__main__" and os.environ.get("PROBE3", "0") == "1":
    print("--- parallel-chain sweeps (per-iteration ns; /par = per chain) ---",
          flush=True)
    for par in (1, 2, 4, 6):
        s = smem_par(par)
        print(f"par={par} smem_par {s/N*1e9:7.2f} ns/iter "
              f"({s/N/par*1e9:6.2f}/chain)", flush=True)
    for par in (1, 2, 4, 6):
        d = dynrow_par(par)
        ds = dynrow_par(par, shared=True)
        print(f"par={par} dynrow own-ref {d/N*1e9:7.2f} shared-ref "
              f"{ds/N*1e9:7.2f} ns/iter", flush=True)


def dynrmw_par(par, shared=False):
    """par independent dynamic (2,128) row READ-MODIFY-WRITE chains, own
    scratch refs vs one shared ref: does Mosaic overlap RMWs it can prove
    disjoint, and serialize ones it cannot?"""
    def kernel(seed_ref, out_ref, *scr):
        scr = scr if not shared else (scr[0],) * par
        def body(i, xs):
            nxs = []
            for j in range(par):
                x = (xs[j] * 1103515245 + 12345 + j) & 63
                nxs.append(x)
                pair = scr[j][pl.ds(x, 2), :]
                scr[j][pl.ds(x, 2), :] = pair ^ (x + j)
            return tuple(nxs)
        xs = lax.fori_loop(0, N, body,
                           tuple(jnp.int32(j) for j in range(par)))
        out_ref[0, 0:2] = scr[0][pl.ds(0, 2), :] + xs[0]
        out_ref[0, 2:8] = jnp.zeros((6, 128), jnp.int32)

    nscr = 1 if shared else par

    @jax.jit
    def run(seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.int32)
                            for _ in range(nscr)],
        )(seed)
    return _time(run, jnp.arange(1, dtype=jnp.int32))


def bigstate_par(par, ns=7):
    """par chains each carrying ns live scalars through a chase + ALU mix —
    register-pressure probe for the interleaved VM."""
    def kernel(tab_ref, out_ref):
        def body(i, st):
            out = []
            for j in range(par):
                s = list(st[j])
                s[0] = tab_ref[s[0]]
                for k in range(1, ns):
                    s[k] = (s[k] * 29 + s[k - 1] + k) & 0x3FFF
                out.append(tuple(s))
            return tuple(out)
        st = lax.fori_loop(
            0, N, body,
            tuple(tuple(jnp.int32(j * ns + k) for k in range(ns))
                  for j in range(par)))
        tot = jnp.int32(0)
        for j in range(par):
            for k in range(ns):
                tot = tot + st[j][k]
        out_ref[0] = jnp.full((8, 128), tot, jnp.int32)

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab)
    rng = np.random.default_rng(0)
    perm = rng.permutation(SM).astype(np.int32)
    return _time(run, jnp.asarray(perm))


if __name__ == "__main__" and os.environ.get("PROBE4", "0") == "1":
    print("--- RMW + state-pressure sweeps ---", flush=True)
    for par in (1, 2, 4, 6):
        d = dynrmw_par(par)
        ds = dynrmw_par(par, shared=True)
        print(f"par={par} dynRMW own-ref {d/N*1e9:7.2f} shared-ref "
              f"{ds/N*1e9:7.2f} ns/iter", flush=True)
    for par in (1, 6):
        for ns in (7, 14):
            b = bigstate_par(par, ns)
            print(f"par={par} ns={ns} bigstate {b/N*1e9:7.2f} ns/iter",
                  flush=True)


def vec_chain(u, rollit=False):
    """u dependent (8,128) vector ALU steps per iteration (optionally with a
    dynamic-amount lane roll in the chain) — vector dependency latency."""
    def kernel(seed_ref, out_ref):
        def body(i, st):
            x, h = st
            for _ in range(u):
                x = (x * 1103515245 + 12345) & 31
                if rollit:
                    h = pltpu.roll(h, x, 1) + 1
                else:
                    h = (h ^ (h + x)) | 1
            return (x, h)
        x, h = lax.fori_loop(0, N // u, body,
                             (seed_ref[0], jnp.zeros((8, 128), jnp.int32)))
        out_ref[0] = h + x

    @jax.jit
    def run(seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(seed)
    return _time(run, jnp.arange(1, dtype=jnp.int32))


def split_ref_chain(u):
    """Literal-piece pattern with SPLIT refs: dynamic read from a read-only
    ref + dynamic write to a separate dest ref (no RMW): does the
    read->write sequence pipeline across iterations?"""
    def kernel(seed_ref, out_ref, src_ref, dst_ref):
        def body(i, x):
            for _ in range(u):
                x = (x * 1103515245 + 12345) & 63
                pair = src_ref[pl.ds(x, 2), :]
                dst_ref[pl.ds((x * 7) & 63, 2), :] = pair + x
            return x
        x = lax.fori_loop(0, N // u, body, seed_ref[0])
        out_ref[0, 0:2] = dst_ref[pl.ds(0, 2), :] + x
        out_ref[0, 2:8] = jnp.zeros((6, 128), jnp.int32)

    @jax.jit
    def run(seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.int32),
                            pltpu.VMEM((128, 128), jnp.int32)],
        )(seed)
    return _time(run, jnp.arange(1, dtype=jnp.int32))


def rmw_chain_same(u):
    """The v2 merge pattern: dynamic RMW on ONE ref where the read address
    differs from the write address (may-alias) — the suspected serializer."""
    def kernel(seed_ref, out_ref, scr_ref):
        def body(i, x):
            for _ in range(u):
                x = (x * 1103515245 + 12345) & 63
                pair = scr_ref[pl.ds(x, 2), :]                  # window read
                scr_ref[pl.ds((x * 7) & 63, 2), :] = pair ^ x   # merge write
            return x
        x = lax.fori_loop(0, N // u, body, seed_ref[0])
        out_ref[0, 0:2] = scr_ref[pl.ds(0, 2), :] + x
        out_ref[0, 2:8] = jnp.zeros((6, 128), jnp.int32)

    @jax.jit
    def run(seed):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, 128), jnp.int32)],
        )(seed)
    return _time(run, jnp.arange(1, dtype=jnp.int32))


if __name__ == "__main__" and os.environ.get("PROBE5", "0") == "1":
    print("--- vector chains / split refs ---", flush=True)
    for u in (2, 8):
        v = vec_chain(u)
        vr = vec_chain(u, rollit=True)
        print(f"u={u} vec_chain {v/N*1e9:7.2f}  +dynroll {vr/N*1e9:7.2f} ns/step",
              flush=True)
    for u in (2, 8):
        s = split_ref_chain(u)
        m = rmw_chain_same(u)
        print(f"u={u} split-ref rd+wr {s/N*1e9:7.2f}  same-ref rmw {m/N*1e9:7.2f} ns/step",
              flush=True)
