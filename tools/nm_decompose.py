"""Decompose the mover-drop counter (sp.nm) into its components on the
real chip, WITHOUT in-graph prints (the axon tunnel has no host
callbacks): re-run the packed advance pipeline stage by stage outside
the sim and fetch every intermediate count.

Components of nm (push.advance_p_packed):
  pcode   lanes stopped with a boundary code / PC_EXHAUSTED
  n_drop  resume-stage exports beyond the K2 = K//8 stage-3 cap
  ovf     n_fix - sum(valid): fix lanes beyond the K fix-up buffer

Also reports the resume pass's own window behavior (oow2: fix lanes the
RESUME kernel could not window — the sparse-buffer suspect).

Usage: python tools/nm_decompose.py [npart_total] [nx] [n_walk] [warm]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    npart = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n_walk = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    warm = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from __graft_entry__ import _build
    from vpic_tpu.particles import push as ppush
    from vpic_tpu.particles import push_pallas as pk
    from vpic_tpu.particles.push import (WalkState, compact_indices,
                                         compact_indices_hier,
                                         resolve_crossing, _push_math)

    nz = int(os.environ.get("NM_NZ", 1))
    ny = int(os.environ.get("NM_NY", nx))
    sim = _build(nx=nx, ny=ny, nz=nz, npart=npart // 2, n_walk=n_walk)
    g = sim.grid
    sim.advance(warm)
    st = sim.state
    ga = st.grid_arrays
    table = ppush.make_interp_t(st.interpolator, g, exc_t=ga.exc_t)
    nb_tab = ga.neighbor

    # fix_cap exactly as step.py provisions it for this deck
    from vpic_tpu.engine.step import StepOptions  # noqa: F401

    for sp in st.species:
        psp = ppush.pack_species(sp, g)
        max_np = psp.max_np
        k = sim.opts.resort_interval
        if sp.sort_interval > k:
            k = sp.sort_interval
        # mirror the step.py traffic model (env override for sweeps)
        if os.environ.get("VPIC_TPU_FIX_CAP"):
            fix_cap = int(os.environ["VPIC_TPU_FIX_CAP"])
        else:
            lay0 = pk.kernel_layout(g)
            if lay0 == "interior":
                rate = 0.006 + min(0.0015 * k, 0.012)
            else:
                rate = 0.022 + min(0.01 * k, 0.05)
                win0 = pk.kernel_window(g)[0]
                if any(abs(s) >= win0 for s in pk.kernel_strides(g)):
                    rate += 0.04
                elif lay0 == "tiled" and pk.tile_shape(g)[1] > 1:
                    rate += 0.02
            fix_cap = max(8192, int(max_np * rate))
        K = min(fix_cap, max_np, 2048 * 128)

        qdt_2mc = (0.5 * psp.q_m * g.dt / g.cvac).astype(jnp.float32)
        cdt = (jnp.float32(g.cvac * g.dt * g.rdx),
               jnp.float32(g.cvac * g.dt * g.rdy),
               jnp.float32(g.cvac * g.dt * g.rdz))
        params = jnp.stack([qdt_2mc, *cdt]).astype(jnp.float32)
        lay = pk.kernel_layout(g)
        nvk = pk.kernel_nv(g)
        strides = pk.kernel_strides(g)
        wraps, mod = pk.kernel_wraps(g), pk.kernel_mod(g)
        window, pre = pk.kernel_window(g)
        # mirror push.py's density-aware layouts (round-4 fix): main calls
        # size for n=max_np, the resume call for n=K
        lay1 = pk.pick_layout(nvk, max_np, window, pre)
        lay2 = pk.pick_layout(nvk, K, window, pre)

        @jax.jit
        def stage1(pkrows, npv):
            vox_k = (pkrows[7] + 0.5).astype(jnp.int32)
            acc_t, pout, in_win = pk.fused_push_walk(
                vox_k, pkrows, table, params, strides, nvk,
                n_walk=n_walk, wraps=wraps, mod=mod, **lay1)
            alive = jnp.arange(max_np, dtype=jnp.int32) < npv
            expt = pout[pk.PEXPT] > 0.5
            fix = alive & (expt | ~in_win)
            sel, n_fix, valid = compact_indices_hier(fix, K, max_np)
            return (pout, in_win, jnp.sum(alive & expt),
                    jnp.sum(alive & ~in_win), n_fix,
                    jnp.sum(valid), sel, valid)

        pout, in_win, n_expt, n_oow, n_fix, n_valid, sel, valid = \
            stage1(psp.pk, psp.np)

        # ---- resume stage, exactly as _resume_fixup sets it up ----
        @jax.jit
        def stage2(pout, sel, valid, pkrows):
            safe = jnp.where(valid, sel, 0)
            redo = valid & ~in_win[safe]
            pf = pout[:, safe]
            px_f, py_f, pz_f = pf[pk.PX], pf[pk.PY], pf[pk.PZ]
            ux_f, uy_f, uz_f = pf[pk.PUX], pf[pk.PUY], pf[pk.PUZ]
            q_f = jnp.where(valid, pf[pk.PQ], 0.0)
            kvox_f = (pf[pk.PVOX] + 0.5).astype(jnp.int32)
            vox_f = (kvox_f if lay == "plain"
                     else pk.vox_of_k(g, jnp.clip(kvox_f, 0, nvk - 1)))
            ipr = st.interpolator[jnp.where(redo, jnp.maximum(vox_f, 0), 0)]
            rux, ruy, ruz, rrx, rry, rrz = _push_math(
                ipr, px_f, py_f, pz_f, ux_f, uy_f, uz_f, qdt_2mc, cdt)

            def mix(r, b):
                return jnp.where(redo, r, b)

            st_in = WalkState(
                x=px_f, y=py_f, z=pz_f, vox=vox_f,
                ux=mix(rux, ux_f), uy=mix(ruy, uy_f), uz=mix(ruz, uz_f),
                rx=mix(rrx, pf[pk.PRX]), ry=mix(rry, pf[pk.PRY]),
                rz=mix(rrz, pf[pk.PRZ]),
                q=q_f, pcode=jnp.zeros((K,), jnp.int32), active=valid)
            stype_b = jnp.where(redo, 3,
                                (pf[pk.PTYPE] + 0.5).astype(jnp.int32))
            dir_b = jnp.where(redo, 0.0, pf[pk.PDIR])
            pos_b = (st_in.x, st_in.y, st_in.z)
            rem_b = (st_in.rx, st_in.ry, st_in.rz)
            stw = resolve_crossing(st_in, pos_b, rem_b,
                                   (st_in.ux, st_in.uy, st_in.uz),
                                   pos_b, rem_b, stype_b,
                                   (dir_b, dir_b, dir_b), nb_tab, g)
            walk = valid & (stw.pcode == 0) & (
                (stw.rx != 0) | (stw.ry != 0) | (stw.rz != 0))
            stw = stw._replace(active=walk)

            # resume kernel input (push._resume_fixup:374-396)
            K2 = min(K, max(1024, K // 4))
            voxk = (stw.vox if lay == "plain"
                    else pk.kvox_of(g, jnp.clip(stw.vox, 0, g.nv - 1))
                    ).astype(jnp.int32)
            rxk = jnp.where(walk, stw.rx, 0.0)
            ryk = jnp.where(walk, stw.ry, 0.0)
            rzk = jnp.where(walk, stw.rz, 0.0)
            tgt = jnp.where(valid, sel, max_np)
            (voxs, xs, ys, zs, rxs, rys, rzs, qs, uxs, uys, uzs, tgt_s,
             pcode_s, rxt, ryt, rzt) = jax.lax.sort(
                [voxk, stw.x, stw.y, stw.z, rxk, ryk, rzk, stw.q,
                 stw.ux, stw.uy, stw.uz, tgt.astype(jnp.int32),
                 stw.pcode.astype(jnp.int32), stw.rx, stw.ry, stw.rz],
                num_keys=1)
            walk_s = (rxs != 0) | (rys != 0) | (rzs != 0)
            pstate11 = jnp.stack([xs, ys, zs, rxs, rys, rzs, qs,
                                  voxs.astype(jnp.float32),
                                  uxs, uys, uzs], axis=0)
            acc2, pout2, in_win2 = pk.fused_push_walk(
                voxs, pstate11, table, params, strides, nvk,
                n_walk=n_walk, resume=True, wraps=wraps, mod=mod, **lay2)
            expt2 = ((pout2[pk.PEXPT] > 0.5) | ~in_win2) & walk_s
            sel2, n2, valid2 = compact_indices(expt2, K2, K)
            return (jnp.sum(walk), jnp.sum(walk_s),
                    jnp.sum(walk_s & ~in_win2),
                    jnp.sum(walk_s & (pout2[pk.PEXPT] > 0.5)),
                    n2, jnp.sum(valid2), jnp.int32(K2))

        n_walklanes, n_walk_s, oow2, expt2, n2, n_valid2, K2 = \
            stage2(pout, sel, valid, psp.pk)

        live = int(np.asarray(psp.np))
        print(f"{sp.name}: live={live} K={K} n_walk={n_walk}")
        print(f"  stage1: exports={int(n_expt)} ({100*int(n_expt)/live:.2f}%)"
              f" oow={int(n_oow)} n_fix={int(n_fix)} valid={int(n_valid)}"
              f" ovf_term={max(int(n_fix)-int(n_valid), 0)}")
        print(f"  stage2: walking={int(n_walklanes)} "
              f"resume_oow={int(oow2)} resume_expt={int(expt2)} "
              f"n2={int(n2)} valid2={int(n_valid2)} K2={int(K2)} "
              f"n_drop={max(int(n2)-int(n_valid2), 0)}", flush=True)


if __name__ == "__main__":
    if jax.default_backend() == "cpu":
        os.environ["VPIC_TPU_FORCE_FUSED"] = "1"
        from jax.experimental import pallas as _pl  # noqa: F401
        from jax.experimental.pallas import tpu as _pltpu

        with _pltpu.force_tpu_interpret_mode():
            main()
    else:
        main()
