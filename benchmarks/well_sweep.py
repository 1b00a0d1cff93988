"""WELL roofline sweep (VERDICT round-4 item 2): find or refute levers for
the two below-80% configs — geometric n=100k f32 (57%) and n=1M bf16 (64%).

Hypotheses swept:
- BS (stream-block sublanes): n=100k has only ~53k sublanes -> BS=4096
  gives a ~13-step grid where pipeline ramp and the separate x-gather
  launch are a visible fraction; smaller BS trades ramp for more one-hot
  output revisits.
- BG (output groups per super-group): the one-hot routing matmul costs
  2*BG flops/slot at HIGHEST precision — at bf16's ~230 Gslot/s demand
  that is ~19 Tflops of f32-MXU work, co-binding with HBM and the VPU
  lane-gather. Halving BG halves it, at more super-group padding.
- The x-gather's true cost: timed separately (jnp.take of the window rows)
  so the per-slot byte model can be corrected with a measured number.

Run ON TPU (one process). Prints a markdown mini-table; feeds either a
kernel-parameter change in `sparse.well` or the measured-floor amendment
in BASELINE.md.
"""
import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

import tpucg
from tpucg.bench.timing import time_matvec_spread
from tpucg.io.generator import random_geometric_spd
from tpucg.sparse.well import csr_to_well


def sweep(A, label, storage, bs_list, bg_list, steps):
    n = A.shape[0]
    rows = []
    for bg in bg_list:
        for bs in bs_list:
            try:
                well = csr_to_well(A, block_sublanes=bs,
                                   groups_per_super=bg)
            except Exception as e:
                print(f"{label} BS={bs} BG={bg}: pack failed {e}",
                      flush=True)
                continue
            op = tpucg.WellOperator.from_well(
                well, backend="pallas",
                storage_dtype=(jnp.bfloat16 if storage == "bf16"
                               else jnp.float32),
            )
            x = np.random.default_rng(3).standard_normal(
                op.padded_n).astype(np.float32)
            xd = jnp.asarray(x)
            y = np.asarray(op.matvec(xd))[:n]
            y_ref = A.matvec(x[:n].astype(np.float64))
            rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-30)
            assert rel < (2e-2 if storage == "bf16" else 1e-5), (label, rel)
            lo, med, hi = time_matvec_spread(
                lambda o, u: o.matvec(u), op, xd, steps=steps)
            gnnz = A.nnz / med / 1e9
            rows.append((bg, bs, well.fill, well.n_sublanes,
                         med * 1e6, gnnz))
            print(f"| {label} | {bg} | {bs} | {well.fill:.2f} "
                  f"| {well.n_sublanes} | {med*1e6:.0f} "
                  f"({lo*1e6:.0f}-{hi*1e6:.0f}) | {gnnz:.1f} |",
                  flush=True)
    return rows


def time_gather_only(A, label, steps=512):
    """The x window row-gather alone (the stream the 0.5 B/slot model
    amortizes): measured so the byte model can be corrected. The gather
    reads RANDOM 512-B rows — DMA-descriptor-bound, not streaming-bound,
    so its effective GB/s is the number to measure, not assume."""
    well = csr_to_well(A)
    wrow = jnp.asarray(well.wrow)
    G = -(-A.shape[0] // 128)
    xf = jnp.asarray(np.random.default_rng(0).standard_normal(
        G * 128).astype(np.float32))

    from tpucg.bench.timing import time_matvec_loop

    # The gathered rows feed a scalar into the carried vector so the
    # chain stays data-dependent (XLA cannot elide the takes).
    def apply(w, x):
        g = jnp.take(x.reshape(-1, 128), w, axis=0)
        return x + jnp.sum(g) * 1e-30

    t = time_matvec_loop(lambda w, x: apply(w, x), wrow, xf, steps=steps)
    bytes_moved = well.wrow.size * 128 * 4
    print(f"{label} x-gather alone: {t*1e6:.1f} us for "
          f"{bytes_moved/1e6:.1f} MB of window rows -> "
          f"{bytes_moved/t/1e9:.0f} GB/s effective", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2048)
    ap.add_argument("--skip-100k", action="store_true")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    print("| system | BG | BS | fill | sublanes | us (min-max) | Gnnz/s |",
          flush=True)
    print("|---|---|---|---|---|---|---|", flush=True)

    geo100k = random_geometric_spd(100_000, seed=0, avg_degree=12.0)
    if not args.skip_100k:
        sweep(geo100k[0], "geo100k f32", "f32",
              bs_list=(1024, 2048, 4096), bg_list=(32, 64, 128),
              steps=args.steps)
    time_gather_only(geo100k[0], "geo100k", steps=args.steps)

    geo1m = random_geometric_spd(1_000_000, seed=0, avg_degree=12.0)
    time_gather_only(geo1m[0], "geo1m", steps=512)
    sweep(geo1m[0], "geo1m f32", "f32",
          bs_list=(4096,), bg_list=(32, 64, 128), steps=512)
    sweep(geo1m[0], "geo1m bf16", "bf16",
          bs_list=(2048, 4096), bg_list=(16, 32, 64, 128), steps=512)


if __name__ == "__main__":
    main()
