"""One-process TPU probe: which gather primitives does Mosaic support, and
how fast are they? Decides the irregular-sparse (ELL/BSR) Pallas kernel
design (VERDICT round 2, next #1). Run ON TPU: python benchmarks/probe_gather.py
"""
import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucg.bench import timing

LANE = 128


def report(name, fn, *args, bytes_moved=None, elems=None):
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        _ = jax.device_get(out)  # force through tunnel
        t = timing.time_fn(lambda: jax.jit(fn)(*args), fetch=True, repeats=5)
        msg = f"{name}: OK  t={t*1e6:.1f} us"
        if elems:
            msg += f"  {elems / t / 1e9:.1f} Gelem/s"
        if bytes_moved:
            msg += f"  {bytes_moved / t / 1e9:.1f} GB/s"
        print(msg, flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL  {type(e).__name__}: {str(e)[:300]}", flush=True)
        return False


def chained(name, fn, args, iters, elems_per_call):
    """Chained differencing: run fn iters times data-dependently."""
    try:
        def chain(k):
            def body(c, _):
                out = fn(*((c,) + args[1:]))
                # feed a scalar back so the chain is data-dependent
                return c * 0 + args[0] + 0e-30 * jnp.sum(out), None
            r, _ = jax.lax.scan(body, args[0], None, length=k)
            return r
        j = jax.jit(chain, static_argnums=0)
        _ = jax.device_get(j(2))
        t2 = timing.time_fn(lambda: j(iters // 4), fetch=True, repeats=3)
        t1 = timing.time_fn(lambda: j(iters), fetch=True, repeats=3)
        per = (t1 - t2) / (iters - iters // 4)
        print(f"{name}: {per*1e6:.2f} us/call  "
              f"{elems_per_call / per / 1e9:.2f} Gelem/s", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # ---- Probe 1: lane gather inside pallas (take_along_axis axis=-1) ----
    R = 256
    V = jnp.asarray(rng.standard_normal((R, LANE)), jnp.float32)
    LI = jnp.asarray(rng.integers(0, LANE, (R, LANE)), jnp.int32)

    def lane_gather_kernel(v_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(v_ref[...], i_ref[...], axis=1)

    def lane_gather(v, i):
        return pl.pallas_call(
            lane_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        )(v, i)

    ok_lane = report("pallas lane-gather (take_along_axis axis=1)",
                     lane_gather, V, LI, elems=R * LANE)

    # ---- Probe 2: sublane gather inside pallas (take_along_axis axis=0) ----
    def sub_gather_kernel(v_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(v_ref[...], i_ref[...], axis=0)

    def sub_gather(v, i):
        return pl.pallas_call(
            sub_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        )(v, i)

    report("pallas sublane-gather (take_along_axis axis=0)",
           sub_gather, V, jnp.asarray(rng.integers(0, R, (R, LANE)), jnp.int32),
           elems=R * LANE)

    # ---- Probe 3: row gather from VMEM x via vector indices (x2[idx]) ----
    XR = 2048
    x2 = jnp.asarray(rng.standard_normal((XR, LANE)), jnp.float32)
    ridx = jnp.asarray(rng.integers(0, XR, (R,)), jnp.int32)

    def row_gather_kernel(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take(x_ref[...], i_ref[...], axis=0)

    def row_gather(x, i):
        return pl.pallas_call(
            row_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        )(x, i)

    report("pallas row-gather (jnp.take axis=0, vector idx)",
           row_gather, x2, ridx, elems=R * LANE)

    # ---- Probe 4: full element gather inside pallas ----
    xf = jnp.asarray(rng.standard_normal((XR * LANE,)), jnp.float32)
    eidx = jnp.asarray(rng.integers(0, XR * LANE, (R, LANE)), jnp.int32)

    def elem_gather_kernel(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take(x_ref[...], i_ref[...])

    def elem_gather(x, i):
        return pl.pallas_call(
            elem_gather_kernel,
            out_shape=jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        )(x, i)

    report("pallas elem-gather (jnp.take flat)",
           elem_gather, xf, eidx, elems=R * LANE)

    # ---- Probe 5: dynamic slice rows by SMEM scalars (scalar prefetch) ----
    NW = 64
    widx = jnp.asarray(rng.integers(0, XR - 8, (NW,)), jnp.int32)

    def dynslice_kernel(w_ref, x_ref, o_ref):
        def body(k, acc):
            row = x_ref[pl.ds(w_ref[k], 8), :]
            return acc + row
        acc = jax.lax.fori_loop(0, NW, body,
                                jnp.zeros((8, LANE), jnp.float32))
        o_ref[...] = acc

    def dynslice(w, x):
        return pl.pallas_call(
            dynslice_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec((XR, LANE), lambda i, w: (0, 0))],
                out_specs=pl.BlockSpec((8, LANE), lambda i, w: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
        )(w, x)

    report(f"pallas dyn-slice x{NW} (8,128) rows by SMEM scalar",
           dynslice, widx, x2, elems=NW * 8 * LANE)

    # ---- Probe 6: pltpu.roll dynamic shift amount ----
    def roll_dyn_kernel(s_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], s_ref[0], 1)

    def roll_dyn(s, x):
        return pl.pallas_call(
            roll_dyn_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec((R, LANE), lambda i, s: (0, 0))],
                out_specs=pl.BlockSpec((R, LANE), lambda i, s: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(s, x)

    report("pallas roll with dynamic shift",
           roll_dyn, jnp.asarray([5], jnp.int32), V, elems=R * LANE)

    # ---- Rate probes (chained, steady-state) ----
    if ok_lane:
        # big lane-gather: stream V/LI from HBM, gather, write
        RB = 8192  # 8192*128 = 1M elems, V+LI+out = 12 MB
        Vb = jnp.asarray(rng.standard_normal((RB, LANE)), jnp.float32)
        LIb = jnp.asarray(rng.integers(0, LANE, (RB, LANE)), jnp.int32)

        def lg_big_kernel(v_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(v_ref[...], i_ref[...], axis=1)

        @jax.jit
        def lg_big(v, i):
            bs = 512
            return pl.pallas_call(
                lg_big_kernel,
                grid=(RB // bs,),
                in_specs=[pl.BlockSpec((bs, LANE), lambda k: (k, 0)),
                          pl.BlockSpec((bs, LANE), lambda k: (k, 0))],
                out_specs=pl.BlockSpec((bs, LANE), lambda k: (k, 0)),
                out_shape=jax.ShapeDtypeStruct((RB, LANE), jnp.float32),
            )(v, i)

        chained("RATE lane-gather 1M elems (stream V+LI, write out)",
                lambda v, i: lg_big(v, i), (Vb, LIb), 64, RB * LANE)

    # XLA baselines
    chained("RATE xla row-gather (take axis=0) 256k rows",
            lambda i, x: jnp.take(x, i, axis=0),
            (jnp.asarray(rng.integers(0, XR, (2048,)), jnp.int32), x2),
            64, 2048 * LANE)
    chained("RATE xla elem-gather (take flat) 262144 elems",
            lambda i, x: jnp.take(x, i),
            (jnp.asarray(rng.integers(0, XR * LANE, (2048, LANE)),
                         jnp.int32), xf),
            16, 2048 * LANE)


if __name__ == "__main__":
    main()
