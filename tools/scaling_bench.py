"""Scaling table in the spirit of decks/vpic32.csv: sweep particle counts
and grid sizes on the 2D reconnection-class deck and print one CSV row per
configuration (ms/step, pushes/s, speedup vs the reference's 7.8M/s CPU
headline).

Usage: python tools/scaling_bench.py [steps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

CONFIGS = [
    # (npart_total, nx, ny, nz)
    (1_000_000, 128, 128, 1),
    (4_000_000, 128, 128, 1),
    (8_000_000, 128, 128, 1),
    (8_000_000, 256, 256, 1),
    (16_000_000, 256, 256, 1),
    (8_000_000, 512, 512, 1),
    (8_000_000, 64, 64, 64),
]


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from __graft_entry__ import _build

    only = os.environ.get("SCALE_ONLY")  # e.g. "512" to filter configs
    print("npart,nx,ny,nz,ms_per_step,pushes_per_s,vs_ref_cpu")
    for npart, nx, ny, nz in CONFIGS:
        if only and only not in (str(nx), f"{nx}x{ny}x{nz}"):
            continue
        sim = _build(nx=nx, ny=ny, nz=nz, npart=npart // 2)
        # align warmup AND the timed region to whole super-cycles
        # (resort_interval x cycle_mult) so the A/B sort-cadence mix is
        # steady-state and every dispatch shape is pre-compiled
        period = sim.opts.resort_interval * getattr(sim, "_cycle_mult", 1)
        sim.advance(period)
        # scalar fetch = reliable barrier over the tunneled backend
        int(np.asarray(sim.state.species[0].np))
        nst = max(period, (steps // period) * period)
        sim.advance(nst)
        int(np.asarray(sim.state.species[0].np))
        t0 = time.perf_counter()
        sim.advance(nst)
        int(np.asarray(sim.state.species[0].np))
        dt = time.perf_counter() - t0
        total = sum(int(np.asarray(sp.np)) for sp in sim.state.species)
        pps = total * nst / dt
        print(f"{total},{nx},{ny},{nz},{dt / nst * 1e3:.1f},"
              f"{pps:.3e},{pps / 7.8e6:.2f}", flush=True)
        del sim


if __name__ == "__main__":
    main()
