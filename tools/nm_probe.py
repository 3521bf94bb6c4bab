"""Diagnose the mover-drop counter (sp.nm) on the closed bench deck.

A closed periodic box must process every mover (nm == 0, the
advance.cxx:98-103 invariant); this probe runs the fused+packed bench
path at scale with VPIC_TPU_NM_DEBUG=1 so every advance_p dispatch
prints its counter components (pcode, resume-cap drops, fix-buffer
overflow) from inside the jitted step.

Usage: python tools/nm_probe.py [npart_total] [nx] [steps] [n_walk]
"""

import os
import sys

os.environ.setdefault("VPIC_TPU_NM_DEBUG", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    npart = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_walk = int(sys.argv[4]) if len(sys.argv) > 4 else None

    from __graft_entry__ import _build

    sim = _build(nx=nx, ny=nx, nz=1, npart=npart // 2, n_walk=n_walk)
    np0 = sum(int(np.asarray(sp.np)) for sp in sim.state.species)
    print(f"deck {nx}^2 np={np0} n_walk={n_walk} "
          f"fix_cap={sim.opts.fix_cap}", flush=True)
    for chunk in range(steps // 8 or 1):
        sim.advance(8)
        for sp in sim.state.species:
            print(f"after step {sim.step_count}: {sp.name} "
                  f"nm={int(np.asarray(sp.nm))}", flush=True)
    np1 = sum(int(np.asarray(sp.np)) for sp in sim.state.species)
    print(f"np {np0} -> {np1}", flush=True)


if __name__ == "__main__":
    main()
