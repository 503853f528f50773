"""Build capped/uncapped peptide PDBs from sequences.

Reference parity: /root/reference/scripts/prepare_pdb.py (tleap there; pure
NeRF internal-coordinate construction here, see
jamun_tpu/data/peptide_builder.py).

Usage:
    python scripts/prepare_pdb.py AG SVL --capped --out pdbs/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jamun_tpu.data.peptide_builder import build_peptide
from jamun_tpu.data.topology import save_pdb


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("sequences", nargs="+", help="one-letter (AG) or ALA_GLY style")
    parser.add_argument("--capped", action="store_true", help="add ACE/NME caps")
    parser.add_argument("--out", default="pdbs")
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for seq in args.sequences:
        top, pos = build_peptide(seq, capped=args.capped)
        path = os.path.join(args.out, f"{seq}.pdb")
        save_pdb(path, top, pos)
        print(f"wrote {path}: {top.n_atoms} heavy atoms, {len(top.bonds)} bonds")


if __name__ == "__main__":
    main()
