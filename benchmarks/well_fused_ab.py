"""A/B: in-kernel fused window gather vs the two-dispatch WELL matvec.

The round-4 measured-floor amendment (BASELINE.md) attributes the
geometric n=100k row's 57%-of-plain-model gap to kernel STRUCTURE: a
separate descriptor-bound XLA row-gather dispatch (measured ~15 us
standalone) plus the 13-block grid ramp. ``well_spmv_fused_gather``
(kernels/gather_spmv.py) collapses both — the gather runs as in-kernel
double-buffered async row DMA issued one stream block ahead, overlapped
with value streaming. This script measures the two arms side by side ON
CHIP (VERDICT r4 #6: done = n=100k >= 70% of the plain model, or this
negative published with numbers).

Run ON TPU: python benchmarks/well_fused_ab.py
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import tpucg
from tpucg.bench.timing import time_matvec_robust
from tpucg.io.generator import fem_p1_system, random_geometric_spd
from tpucg.kernels.gather_spmv import well_spmv, well_spmv_fused_gather
from tpucg.sparse.well import csr_to_well

ROOFLINE_GBPS = 816.0
BYTES_PER_SLOT = 5.5


def arm(name, A, steps=2048):
    w = csr_to_well(A)
    n = A.shape[0]
    npad = -(-n // 128) * 128
    x = np.random.default_rng(3).standard_normal(npad).astype(np.float32)
    x2 = jnp.asarray(x.reshape(-1, 128))
    args = (jnp.asarray(w.vals), jnp.asarray(w.lidx), jnp.asarray(w.gidl),
            jnp.asarray(w.wrow), jnp.asarray(w.sgb), x2,
            w.groups_per_super, w.n_supergroups)
    y_ref = None
    rows = {}
    bg, nsg = args[6], args[7]
    arrs = args[:5]
    for label, fn in (("two-dispatch", well_spmv),
                      ("fused-gather", well_spmv_fused_gather)):
        try:
            y = np.asarray(fn(*args))
            if y_ref is None:
                y_ref = y
            else:
                rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-30)
                assert rel < 1e-5, (label, rel)

            # operand = the WELL array tuple (a real jit argument, not a
            # closure capture); bg/nsg are static ints closed over. The
            # chain wants flat (npad,) in/out (dot_xla is 1-D); the kernel
            # output is supergroup-padded (nsg*bg, 128) — truncate back.
            ng = x2.shape[0]

            def apply(op, u, fn=fn):
                y2 = fn(op[0], op[1], op[2], op[3], op[4],
                        u.reshape(ng, 128), bg, nsg)
                return y2.reshape(-1)[: ng * 128]

            s = time_matvec_robust(apply, arrs, x2.reshape(-1), steps=steps)
            gnnz = A.nnz / s / 1e9
            fill = A.nnz / (w.vals.size)
            ceil = fill * (ROOFLINE_GBPS / BYTES_PER_SLOT)
            rows[label] = (s, gnnz, 100 * gnnz / ceil)
            print(f"{name} [{label}]: {s*1e6:.1f} us  {gnnz:.1f} Gnnz/s "
                  f"({100*gnnz/ceil:.0f}% of plain model)", flush=True)
        except Exception as e:  # publish failures honestly
            rows[label] = None
            print(f"{name} [{label}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    return rows


def main():
    print("devices:", jax.devices(), flush=True)
    geo100k = random_geometric_spd(100_000, seed=0, avg_degree=12.0)[0]
    arm("geometric n=100k", geo100k)
    fem300k = fem_p1_system(300_000, seed=0)[0]
    arm("FEM P1 n=300k", fem300k, steps=1024)
    geo1m = random_geometric_spd(1_000_000, seed=0, avg_degree=12.0)[0]
    arm("geometric n=1M", geo1m, steps=512)


if __name__ == "__main__":
    main()
