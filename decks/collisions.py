"""Collisional warm-plasma deck — exercises the ``user_particle_collisions``
deck section (reference hook: src/vpic/advance.cxx:67, installed via
``begin_particle_collisions`` in src/deck_wrapper.cxx:16-36; the reference
ships NO collision model — the section is user code, so this deck is the
vpic_tpu example of writing one).

Model: per-step pitch-angle (Lorentz) scattering with collision frequency
``nu`` — each particle's momentum is rotated by a Gaussian angle of
variance 2*nu*dt about a random perpendicular axis.  Rotations preserve
|u| exactly, so species kinetic energy is conserved to fp roundoff while
momenta isotropize (the standard test for a pitch-angle operator).

Knobs via environment: COLL_NX, COLL_PPC, COLL_NU, COLL_STEPS.
Run:  python -m vpic_tpu.cli.run decks/collisions.py --num-step 100
"""

import dataclasses
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from vpic_tpu import Simulation


def _env(name, default, cast=int):
    return cast(os.environ.get(name, default))


def make_pitch_angle_collisions(nu_dt: float, species_ids=None):
    """Build a jax-traceable SimState -> SimState collision hook."""
    nu_dt = float(nu_dt)

    def rotate(sp, key):
        ux, uy, uz = sp.ux, sp.uy, sp.uz
        u2 = ux * ux + uy * uy + uz * uz
        u = jnp.sqrt(u2)
        k1, k2 = jax.random.split(key)
        # scattering angle theta ~ N(0, 2 nu dt), azimuth uniform
        theta = jnp.sqrt(jnp.float32(2.0 * nu_dt)) * jax.random.normal(
            k1, ux.shape, jnp.float32)
        phi = jax.random.uniform(k2, ux.shape, jnp.float32,
                                 0.0, 2.0 * math.pi)
        # orthonormal frame (e1, e2) perpendicular to u; guard u ~ 0
        safe = jnp.where(u > 1e-30, u, 1.0)
        wx, wy, wz = ux / safe, uy / safe, uz / safe
        # pick a helper axis not parallel to u
        use_x = jnp.abs(wx) < 0.9
        hx = jnp.where(use_x, 1.0, 0.0)
        hy = jnp.where(use_x, 0.0, 1.0)
        # e1 = w x h, normalized; e2 = w x e1
        e1x = wy * 0.0 - wz * hy
        e1y = wz * hx - wx * 0.0
        e1z = wx * hy - wy * hx
        n1 = jnp.sqrt(e1x * e1x + e1y * e1y + e1z * e1z)
        n1 = jnp.where(n1 > 1e-30, n1, 1.0)
        e1x, e1y, e1z = e1x / n1, e1y / n1, e1z / n1
        e2x = wy * e1z - wz * e1y
        e2y = wz * e1x - wx * e1z
        e2z = wx * e1y - wy * e1x
        ct, st = jnp.cos(theta), jnp.sin(theta)
        cp, sp_ = jnp.cos(phi), jnp.sin(phi)
        dx_ = st * (cp * e1x + sp_ * e2x)
        dy_ = st * (cp * e1y + sp_ * e2y)
        dz_ = st * (cp * e1z + sp_ * e2z)
        nux = u * (ct * wx + dx_)
        nuy = u * (ct * wy + dy_)
        nuz = u * (ct * wz + dz_)
        keep = sp.alive & (u2 > 0)
        return sp.replace(ux=jnp.where(keep, nux, ux),
                          uy=jnp.where(keep, nuy, uy),
                          uz=jnp.where(keep, nuz, uz))

    def hook(state):
        rng, sub = jax.random.split(state.rng)
        keys = jax.random.split(sub, len(state.species))
        species = []
        for k, sp in enumerate(state.species):
            if species_ids is None or sp.sid in species_ids:
                sp = rotate(sp, keys[k])
            species.append(sp)
        return dataclasses.replace(state, species=tuple(species), rng=rng)

    return hook


def deck():
    nx = _env("COLL_NX", 32)
    ppc = _env("COLL_PPC", 64)
    nu = _env("COLL_NU", 0.05, float)

    L = 1.0
    sim = Simulation(seed=_env("COLL_SEED", 11))
    sim.define_units(1.0, 1.0)
    dt = 0.9 * sim.courant_length(L, L, L, nx, nx, 1)
    sim.define_timestep(dt)
    sim.define_periodic_grid(0, 0, 0, L, L, L, nx, nx, 1)
    sim.define_material("vacuum")
    n = nx * nx * ppc
    e = sim.define_species("electron", -1.0, int(n * 1.25))

    # anisotropic initial distribution: collisions must isotropize it
    sim.inject_particle(
        e, sim.uniform(n, 0, L), sim.uniform(n, 0, L), sim.uniform(n, 0, L),
        sim.maxwellian(n, 0.2), sim.maxwellian(n, 0.05),
        sim.maxwellian(n, 0.05), q=-1.0 / n)

    sim.finalize(
        user_particle_collisions=make_pitch_angle_collisions(nu * dt))
    return sim


if __name__ == "__main__":
    sim = deck()
    steps = _env("COLL_STEPS", 50)

    def aniso(s):
        sp = s.state.species[0]
        alive = np.asarray(sp.alive)
        ux2 = float(np.mean(np.asarray(sp.ux)[alive] ** 2))
        up2 = float(np.mean(np.asarray(sp.uy)[alive] ** 2
                            + np.asarray(sp.uz)[alive] ** 2)) / 2
        return ux2 / up2

    print(f"anisotropy before: {aniso(sim):.2f}")
    sim.advance(steps)
    print(f"anisotropy after {steps} steps: {aniso(sim):.2f}")
    print("energies:", sim.energies())
