"""On-hardware physics evidence, recorded per round (VERDICT round-3
item 9): run the bench deck N steps on the REAL chip and append energy
drift, cumulative dropped movers, live counts, and field/species
checksums to EVIDENCE.jsonl — so perf rounds cannot silently regress
physics (the round-4 lesson: drops were invisible in energy drift and
the per-step nm reset masked them).

Usage: python tools/evidence.py [steps] [npart_total] [nx]
Appends one JSON line to EVIDENCE.jsonl at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    npart = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    nx = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    from __graft_entry__ import _build

    # mirror bench.py's knob env so evidence runs at the exact bench
    # configuration (round-4 lesson: entries without their knob set are
    # not reproducible)
    resort = int(os.environ.get("BENCH_RESORT", 2))
    ion_mult = int(os.environ.get("BENCH_ION_MULT", 4))
    n_walk = os.environ.get("BENCH_NWALK")
    knobs = dict(resort=resort, ion_mult=ion_mult,
                 n_walk=int(n_walk) if n_walk else None,
                 fix_cap=os.environ.get("VPIC_TPU_FIX_CAP"),
                 env={k: v for k, v in os.environ.items()
                      if k.startswith("VPIC_TPU_")})
    sim = _build(nx=nx, ny=nx, nz=1, npart=npart // 2,
                 resort_interval=resort, ion_sort_mult=ion_mult,
                 n_walk=int(n_walk) if n_walk else None)
    period = sim.opts.resort_interval * getattr(sim, "_cycle_mult", 1)
    steps = max(period, (steps // period) * period)

    e0 = sim.energies()
    tot0 = float(sum(e0.values()))
    np0 = sum(int(np.asarray(sp.np)) for sp in sim.state.species)

    t0 = time.perf_counter()
    sim.advance(steps)
    int(np.asarray(sim.state.species[0].np))   # tunnel-safe barrier
    wall = time.perf_counter() - t0

    e1 = sim.energies()
    tot1 = float(sum(e1.values()))
    np1 = sum(int(np.asarray(sp.np)) for sp in sim.state.species)
    movers = sim.mover_counts()

    rec = dict(
        ts=time.time(),
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
        deck=f"{nx}x{nx} npart={npart}",
        steps=steps,
        knobs=knobs,
        wall_s=round(wall, 3),
        energy0=tot0,
        energy1=tot1,
        drift=(tot1 - tot0) / tot0 if tot0 else None,
        np_conserved=(np0 == np1),
        dropped_movers=movers,
        field_sha1=sim.checksum_fields(),
        species_sha1={h["name"]: sim.checksum_species(h["name"])
                      for h in sim._species},
    )
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EVIDENCE.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1), flush=True)
    ok = rec["np_conserved"] and abs(rec["drift"]) < 1e-4 \
        and all(v == 0 for v in movers.values())
    print("EVIDENCE " + ("OK" if ok else "SUSPECT"), flush=True)


if __name__ == "__main__":
    main()
