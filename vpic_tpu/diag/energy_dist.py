"""In-deck kinetic-energy diagnostics — the trecon-part energy.cxx
analogue (decks/trecon-part/energy.cxx:1-201):

- :func:`energy_band_dist`: per-cell energy-banded distribution function.
  ``nex`` linear bands of width dke = emax*eth/nex (eth = vth^2/2,
  energy.cxx:88-91); each particle's relativistic KE (gamma-1,
  energy.cxx:99-101) increments band k of its cell, overflow collapses
  into the last band (energy.cxx:103-105); per-cell normalization to unit
  sum (energy.cxx:131-134) and ghost cells take their inward neighbor's
  (normalized) values (energy.cxx:138-160; the reference's in-loop copy
  reads low-side neighbors before their own normalization — a visit-order
  artifact we do not reproduce).
- :func:`energy_spectrum`: the global log-spaced KE histogram — nbin=800
  bins over [1e-4, 1e4) in log10(ke), including the reference's +1 bin
  offset (energy.cxx:107-109).
- :func:`dump_energy_diag`: writes both files with the reference's
  naming convention (HYDRO_FILE_FORMAT / SPEC_FILE_FORMAT,
  turbulence.cxx:27-28): bands appended as nex dense float32 cell arrays,
  spectrum as nbin float32.

Host-side (NumPy): these run at dump intervals, not in the hot loop.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def relativistic_ke(ux, uy, uz):
    """gamma - 1 in mc^2 units (energy.cxx:99-101)."""
    gam2 = 1.0 + ux * ux + uy * uy + uz * uz
    return np.sqrt(gam2) - 1.0


def energy_band_dist(g, ux, uy, uz, cell, alive, nex: int, emax: float,
                     vth: float):
    """(nex, nv) normalized per-cell energy-band distribution."""
    eth = vth * vth / 2.0
    dke = emax * eth / nex
    sel = np.asarray(alive, bool)
    ke = relativistic_ke(np.asarray(ux)[sel], np.asarray(uy)[sel],
                         np.asarray(uz)[sel])
    k = np.minimum((ke / dke).astype(np.int64), nex - 1)
    cells = np.asarray(cell)[sel].astype(np.int64)
    dist = np.zeros((nex, g.nv), np.float32)
    np.add.at(dist, (k, cells), 1.0)

    # per-cell normalization (energy.cxx:131-134)
    tot = dist.sum(axis=0)
    nz = tot > 0
    dist[:, nz] /= tot[nz]

    # ghost cells copy their inward-clamped neighbor (energy.cxx:138-160)
    iz, iy, ix = np.meshgrid(np.arange(g.nzg), np.arange(g.nyg),
                             np.arange(g.nxg), indexing="ij")
    ixn = np.clip(ix, 1, g.nx)
    iyn = np.clip(iy, 1, g.ny)
    izn = np.clip(iz, 1, g.nz)
    nid = (ixn + g.nxg * (iyn + g.nyg * izn)).reshape(-1)
    ghost = ((ix == 0) | (ix == g.nxg - 1) | (iy == 0) | (iy == g.nyg - 1)
             | (iz == 0) | (iz == g.nzg - 1)).reshape(-1)
    dist[:, ghost] = dist[:, nid[ghost]]
    return dist


def energy_spectrum(ux, uy, uz, alive, vth: float, nbin: int = 800,
                    eminp: float = 1e-4, emaxp: float = 1e4):
    """(nbin,) global log-KE histogram (energy.cxx:95-110)."""
    sel = np.asarray(alive, bool)
    ke = relativistic_ke(np.asarray(ux)[sel], np.asarray(uy)[sel],
                         np.asarray(uz)[sel])
    dloge = (np.log10(emaxp) - np.log10(eminp)) / nbin
    edist = np.zeros((nbin,), np.float32)
    pos = ke > 0
    # the reference's bin index includes a +1 offset (energy.cxx:108)
    k = ((np.log10(ke[pos]) - np.log10(eminp)) / dloge + 1).astype(np.int64)
    ok = (k >= 0) & (k <= nbin - 1)
    np.add.at(edist, k[ok], 1.0)
    return edist


def dump_energy_diag(dirname, step: int, species_name: str, rank: int,
                     dist: np.ndarray, edist: np.ndarray):
    """Write band + spectrum files with the reference layout
    (HYDRO_FILE_FORMAT 'hydro/T.%d/%s.%d.%d', SPEC_FILE_FORMAT
    'hydro/T.%d/spectrum-%s.%d.%d'; bands appended, spectrum rewritten)."""
    d = Path(dirname) / f"T.{step}"
    d.mkdir(parents=True, exist_ok=True)
    band_path = d / f"{species_name}.{step}.{rank}"
    with open(band_path, "ab") as fh:
        fh.write(np.ascontiguousarray(dist, "<f4").tobytes())
    spec_path = d / f"spectrum-{species_name}.{step}.{rank}"
    with open(spec_path, "wb") as fh:
        fh.write(np.ascontiguousarray(edist, "<f4").tobytes())
    return band_path, spec_path


def read_energy_diag(dirname, step: int, species_name: str, rank: int,
                     nex: int, nv: int, nbin: int = 800):
    """Readers for the two files -> ((nex, nv), (nbin,))."""
    d = Path(dirname) / f"T.{step}"
    dist = np.fromfile(d / f"{species_name}.{step}.{rank}",
                       "<f4").reshape(-1, nv)[-nex:]
    edist = np.fromfile(d / f"spectrum-{species_name}.{step}.{rank}", "<f4")
    return dist, edist
