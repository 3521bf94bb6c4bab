"""Deck runner CLI — the analogue of the reference's
``mpirun -np N ./deck.op [restart file] [modfile]`` flow
(src/main.cxx:24-122 + vpic-build.in): decks are Python modules instead of
compile-time #include'd C++ (deck_wrapper.cxx:541).

Usage:
    python -m vpic_tpu.cli.run DECK.py [--restart CKPT] [--modfile F.json]
                               [--num-step N] [--quota HOURS]
                               [--status-interval N]

The deck module must define ``deck() -> Simulation`` (grid, species,
fields, particles all configured; ``finalize()`` may be called by the deck
or is called here), and may define ``diagnostics(sim)`` — the
begin_diagnostics section analogue, invoked after every step.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time
from pathlib import Path


def load_deck(path):
    spec = importlib.util.spec_from_file_location("deck", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["deck"] = mod
    spec.loader.exec_module(mod)
    return mod


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("deck")
    ap.add_argument("--restart", default=None,
                    help="checkpoint path to resume from")
    ap.add_argument("--modfile", default=None,
                    help="JSON runtime overrides (modify_runparams)")
    ap.add_argument("--num-step", type=int, default=None)
    ap.add_argument("--quota", type=float, default=None,
                    help="wall-clock quota in hours (defensive checkpoint)")
    ap.add_argument("--status-interval", type=int, default=100)
    ap.add_argument("--checkpoint-dir", default="restart")
    ap.add_argument("--checkpoint-interval", type=int, default=0)
    args = ap.parse_args(argv)

    from ..io.checkpoint import RotatingCheckpointer

    mod = load_deck(args.deck)
    sim = mod.deck()
    if sim.state is None:
        sim.finalize()

    if args.restart:
        sim.restore(args.restart)
        print(f"[vpic_tpu] restored from {args.restart} "
              f"at step {sim.step_count}")

    if args.modfile:
        overrides = json.loads(Path(args.modfile).read_text())
        sim.modify_runparams(**overrides)
        print(f"[vpic_tpu] applied runtime overrides: {overrides}")
    if args.num_step is not None:
        sim.num_step = args.num_step

    diagnostics = getattr(mod, "diagnostics", None)
    ckpt = RotatingCheckpointer(args.checkpoint_dir, args.quota)

    t0 = time.time()
    steps_done = 0
    while sim.num_step <= 0 or sim.step_count < sim.num_step:
        sim.advance(1)
        steps_done += 1
        if diagnostics is not None:
            diagnostics(sim)
        if (args.status_interval > 0
                and sim.step_count % args.status_interval == 0):
            import numpy as _np
            el = time.time() - t0
            # multishard states carry (pz,py,px) shard axes on np
            total = sum(int(_np.asarray(s.np).sum())
                        for s in sim.state.species) or 1
            rate = total * steps_done / el
            print(f"[vpic_tpu] step {sim.step_count}/{sim.num_step} "
                  f"({el:.1f}s, {rate:.3e} pushes/s)", flush=True)
            sim.warn_dropped_movers(log=lambda m: print(
                f"[vpic_tpu] {m}", flush=True))
        if (args.checkpoint_interval > 0
                and sim.step_count % args.checkpoint_interval == 0):
            sim.checkpoint(
                ckpt.base / f"restart{ckpt.rtoggle + 1}" / "restart",
                extra=dict(step_count=sim.step_count))
            ckpt.rtoggle ^= 1
        if ckpt.over_quota():
            # quota-triggered final dump + clean exit
            # (turbulence.cxx:1225-1247)
            slot = ckpt.base / f"restart{ckpt.rtoggle + 1}" / "restart"
            sim.checkpoint(slot, extra=dict(step_count=sim.step_count))
            print(f"[vpic_tpu] quota reached; checkpointed to {slot}")
            return 0

    print(f"[vpic_tpu] done: {sim.step_count} steps "
          f"in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
