"""Profile the advance step on the real chip and print a per-op time
breakdown (aggregated from the jax.profiler perfetto trace).

Usage: python tools/profile_step.py [npart] [nx] [steps]
Env:   PROF_DIR (default /tmp/vpic_prof)
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    npart = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    nz = int(os.environ.get("PROF_NZ", 1))
    ny = int(os.environ.get("PROF_NY", nx))
    prof_dir = os.environ.get("PROF_DIR", "/tmp/vpic_prof")

    from __graft_entry__ import _build
    sim = _build(nx=nx, ny=ny, nz=nz, npart=npart // 2)

    sim.advance(1)
    jax.block_until_ready(sim.state)

    import time
    t0 = time.perf_counter()
    sim.advance(steps)
    jax.block_until_ready(sim.state)
    dt_plain = time.perf_counter() - t0
    total = sum(int(np.asarray(sp.np)) for sp in sim.state.species)
    print(f"== plain: {dt_plain/steps*1e3:.1f} ms/step, "
          f"{total*steps/dt_plain/1e6:.1f} M pushes/s ==")

    os.system(f"rm -rf {prof_dir}")
    with jax.profiler.trace(prof_dir):
        sim.advance(steps)
        jax.block_until_ready(sim.state)

    # aggregate device-side op durations from the perfetto trace
    files = glob.glob(f"{prof_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace found")
        return
    with gzip.open(sorted(files)[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace["traceEvents"]

    # restrict to the leaf-op track ("XLA Ops") of device processes —
    # module-level tracks (jit_*, while bodies) would double-count
    device_pids = set()
    op_tids = set()
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name:
                device_pids.add(e["pid"])
        if e.get("name") == "thread_name":
            if e.get("args", {}).get("name") == "XLA Ops":
                op_tids.add((e["pid"], e.get("tid")))
    by_name = defaultdict(float)
    by_phase = defaultdict(float)
    count = defaultdict(int)
    detail = {}
    total_dev = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        if op_tids and (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "?")
        # module/scan-level envelope events duplicate their leaf ops
        if name.startswith(("jit_", "while", "body", "cond")):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[name] += dur
        count[name] += 1
        total_dev += dur
        args = e.get("args", {}) or {}
        meta = str(args.get("long_name") or args.get("tf_op")
                   or args.get("source") or "")
        if name not in detail:
            detail[name] = meta[:160]
        # phase attribution via jax.named_scope tags in the op path
        phase = "other"
        for p in ("sort", "interp", "push", "emit", "boundary", "jf",
                  "field"):
            if f"phase_{p}" in meta or f"phase_{p}" in name:
                phase = p
                break
        else:
            if "sort" in name:
                phase = "sort"
            elif "pallas" in name or "fused" in name:
                phase = "push"
        by_phase[phase] += dur

    print(f"\n== per-phase (named_scope) breakdown ==")
    print(f"{'phase':>10} {'ms/step':>9} {'%':>6}")
    for p, ms in sorted(by_phase.items(), key=lambda kv: -kv[1]):
        print(f"{p:>10} {ms/steps:9.2f} {100*ms/total_dev:6.1f}")
    print()

    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:50]
    print(f"{'ms_total':>9} {'ms/step':>8} {'n':>6}  name")
    for name, ms in rows:
        print(f"{ms:9.2f} {ms/steps:8.2f} {count[name]:6d}  {name[:60]}  "
              f"{detail.get(name, '')}")

    # the long tail: bucket every op below the listing threshold by its
    # opcode family so "death by a thousand cuts" shows up with a name
    import re as _re
    listed = {n for n, _ in rows}
    fam_ms = defaultdict(float)
    fam_n = defaultdict(int)
    for name, ms in by_name.items():
        if name in listed:
            continue
        fam = _re.sub(r"[.\d]+$", "", name)
        fam_ms[fam] += ms
        fam_n[fam] += count[name]
    print("\n== long tail by opcode family (ops not listed above) ==")
    print(f"{'ms_total':>9} {'ms/step':>8} {'n':>6}  family")
    for fam, ms in sorted(fam_ms.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:9.2f} {ms/steps:8.2f} {fam_n[fam]:6d}  {fam}")

    if os.environ.get("PROF_TAIL"):
        print("\n== top tail ops (individually) ==")
        tail = [(n, m) for n, m in by_name.items() if n not in listed]
        for name, ms in sorted(tail, key=lambda kv: -kv[1])[:40]:
            print(f"{ms:9.2f} {ms/steps:8.2f} {count[name]:6d}  {name[:40]}"
                  f"  {detail.get(name, '')[:140]}")
    print(f"sum over tracked events: {total_dev:.1f} ms "
          f"({total_dev/steps:.1f} ms/step)")


if __name__ == "__main__":
    main()
