"""MD data generation with OpenMM (gated on the optional dependency).

Reference parity: `/root/reference/scripts/generate_data/run_simulation.py` +
`openmm_utils.py` — the staged protocol is:

    energy minimization
    -> position-restrained NVT (harmonic restraints on protein heavy atoms)
    -> position-restrained NPT (MonteCarloBarostat)
    -> unrestrained NVT equilibration
    -> NPT production

with amber99sbildn/TIP3P. OpenMM is not installed in this sandbox; when
available this script runs the same staged protocol and writes a DCD
trajectory in the framework's dataset layout.

Usage:
    python scripts/generate_data/run_simulation.py --pdb AG.pdb --out data/md \
        --production-ns 100 --temperature 300
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# 20 standard amino acids: restraints apply to protein heavy atoms only
# (reference `openmm_utils.py:183-231`).
_PROTEIN_RESIDUES = frozenset(
    "ALA ASP CYS GLU PHE GLY HIS ILE LYS LEU MET ARG PRO GLN ASN SER THR VAL TRP TYR".split()
)


def add_heavy_atom_restraints(sim, positions, topology, k_kcal_per_A2: float, openmm, unit):
    """Harmonic position restraints on protein heavy atoms
    (`k*periodicdistance(x,y,z,x0,y0,z0)^2`, reference `openmm_utils.py:210`).
    Returns the index of the added force so it can be removed later."""
    force = openmm.CustomExternalForce("k*periodicdistance(x, y, z, x0, y0, z0)^2")
    force.addGlobalParameter("k", k_kcal_per_A2 * unit.kilocalories_per_mole / unit.angstroms**2)
    for p in ("x0", "y0", "z0"):
        force.addPerParticleParameter(p)
    for atom in topology.atoms():
        if atom.residue.name in _PROTEIN_RESIDUES and "H" not in atom.name:
            force.addParticle(atom.index, positions[atom.index].value_in_unit(unit.nanometers))
    system = sim.context.getSystem()
    idx = system.addForce(force)
    sim.context.reinitialize(preserveState=True)
    return idx


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pdb", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--forcefield", default="amber99sbildn.xml")
    parser.add_argument("--water", default="tip3p.xml")
    parser.add_argument("--temperature", type=float, default=300.0)
    parser.add_argument("--pressure-bar", type=float, default=1.0)
    parser.add_argument("--timestep-fs", type=float, default=2.0)
    parser.add_argument("--restraint-k", type=float, default=10.0,
                        help="heavy-atom restraint force constant, kcal/(mol*A^2)")
    parser.add_argument("--nvt-restraint-ns", type=float, default=0.3)
    parser.add_argument("--npt-restraint-ns", type=float, default=0.3)
    parser.add_argument("--nvt-equil-ns", type=float, default=0.5)
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
            "reference MD data-generation protocol (minimize -> restrained NVT -> "
            "restrained NPT -> NVT equilibration -> NPT production) and requires "
            "`pip install openmm` on a machine with network access.",
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

    steps_per_ns = int(1e6 / args.timestep_fs)

    print("stage 1/5: energy minimization...")
    sim.minimizeEnergy()
    minimized = sim.context.getState(getPositions=True).getPositions()

    print(f"stage 2/5: restrained NVT ({args.nvt_restraint_ns} ns, k={args.restraint_k})...")
    restraint_idx = add_heavy_atom_restraints(
        sim, minimized, modeller.topology, args.restraint_k, openmm, unit
    )
    sim.context.setVelocitiesToTemperature(args.temperature * unit.kelvin)
    sim.step(int(args.nvt_restraint_ns * steps_per_ns))

    print(f"stage 3/5: restrained NPT ({args.npt_restraint_ns} ns, {args.pressure_bar} bar)...")
    system = sim.context.getSystem()
    barostat_idx = system.addForce(
        openmm.MonteCarloBarostat(args.pressure_bar * unit.bar, args.temperature * unit.kelvin)
    )
    sim.context.reinitialize(preserveState=True)
    sim.step(int(args.npt_restraint_ns * steps_per_ns))

    print(f"stage 4/5: unrestrained NVT equilibration ({args.nvt_equil_ns} ns)...")
    system = sim.context.getSystem()
    # drop barostat + restraints (higher index first so indices stay valid)
    for idx in sorted((restraint_idx, barostat_idx), reverse=True):
        system.removeForce(idx)
    sim.context.reinitialize(preserveState=True)
    sim.step(int(args.nvt_equil_ns * steps_per_ns))

    print(f"stage 5/5: NPT production ({args.production_ns} ns)...")
    system = sim.context.getSystem()
    system.addForce(
        openmm.MonteCarloBarostat(args.pressure_bar * unit.bar, args.temperature * unit.kelvin)
    )
    sim.context.reinitialize(preserveState=True)

    report_steps = int(args.report_ps * 1e3 / args.timestep_fs)
    stem = os.path.splitext(os.path.basename(args.pdb))[0]
    sim.reporters.append(app.DCDReporter(os.path.join(args.out, f"{stem}.dcd"), report_steps))
    sim.reporters.append(
        app.StateDataReporter(
            os.path.join(args.out, f"{stem}.log"), report_steps, step=True,
            potentialEnergy=True, temperature=True, speed=True,
        )
    )
    sim.step(int(args.production_ns * steps_per_ns))
    with open(os.path.join(args.out, f"{stem}_final.pdb"), "w") as f:
        app.PDBFile.writeFile(
            modeller.topology, sim.context.getState(getPositions=True).getPositions(), f
        )
    print("done")


if __name__ == "__main__":
    main()
