#!/usr/bin/env python
"""Mantle-convection driver (reference: apps/TerraNeo/Origin/Convection.cpp
startSimulation loop + parameters.prm): reads a JSON/TOML config, runs the
coupled Stokes + energy time loop, writes radial profiles, VTK snapshots,
continuous checkpoints, and a timing-tree JSON.

Usage:  python apps/terraneo_convection.py [config.json] [--steps N]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from hyteg_tpu.core.config import load_config
from hyteg_tpu.terraneo import ConvectionParameters, ConvectionSimulation


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="output/terraneo")
    ap.add_argument("--vtk-every", type=int, default=0)
    args = ap.parse_args()

    params = ConvectionParameters()
    if args.config:
        cfg = load_config(args.config).as_dict()
        fields = {f.name for f in dataclasses.fields(ConvectionParameters)}
        params = ConvectionParameters(
            **{k: v for k, v in cfg.items() if k in fields})
    os.makedirs(args.out, exist_ok=True)
    if params.checkpoint_every and not params.checkpoint_dir:
        params.checkpoint_dir = args.out

    sim = ConvectionSimulation(params)
    print(f"domain: dim={sim.dim} rmin={params.rmin} rmax={params.rmax} "
          f"level={params.level} T-dofs={sim.T_space.num_global_dofs()}")

    vtk = None
    if args.vtk_every:
        from hyteg_tpu.io.vtk import VTKOutput

        vtk = VTKOutput(args.out, "convection", sim.storage)

    rows = []
    for k in range(args.steps):
        dt = sim.step()
        prof = sim.temperature_profile()
        vrms = float(np.sqrt(max(
            0.0,
            sum(float(sim.T_space.dot(v, v)) for v in sim.x.vel)
            / sim.T_space.num_global_dofs(),
        )))
        rows.append(dict(step=sim.step_count, time=sim.time, dt=dt,
                         vrms=vrms, t_mean=float(prof.mean.mean())))
        print(f"step {sim.step_count:4d}  t={sim.time:.5f}  dt={dt:.2e}  "
              f"vrms={vrms:.4f}  <T>={rows[-1]['t_mean']:.4f}")
        if vtk and (k + 1) % args.vtk_every == 0:
            vtk.add("T", sim.T_space, np.asarray(sim.T))
            vtk.write(params.level, timestep=sim.step_count)

    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(rows, f, indent=1)
    sim.timing.save(os.path.join(args.out, "timing.json"))
    prof = sim.temperature_profile()
    np.savetxt(os.path.join(args.out, "radial_profile.txt"),
               np.stack([prof.radii, prof.mean, prof.vmin, prof.vmax], 1),
               header="r mean min max")
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
