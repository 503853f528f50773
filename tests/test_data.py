"""Data layer tests: PDB/DCD roundtrips, topology encoding, batching, datasets."""

import os

import numpy as np
import pytest

from jamun_tpu.data.batching import BucketSpec, collate
from jamun_tpu.data.dcd import read_dcd, write_dcd
from jamun_tpu.data.residue_metadata import (
    ResidueMetadata,
    convert_to_one_letter_codes,
    convert_to_three_letter_codes,
    encode_atom_code,
    encode_atom_type,
    encode_residue,
)
from jamun_tpu.data.topology import Atom, Topology, load_pdb, preprocess_topology, save_pdb


def _dipeptide_topology():
    """A fake 2-residue peptide: backbone N-CA-C-O per residue, chain geometry."""
    atoms, pos = [], []
    names = ["N", "CA", "C", "O"]
    elements = ["N", "C", "C", "O"]
    for r, res in enumerate(["ALA", "GLY"]):
        for i, (nm, el) in enumerate(zip(names, elements)):
            atoms.append(
                Atom(
                    index=len(atoms),
                    name=nm,
                    element=el,
                    residue_name=res,
                    residue_index=r,
                    residue_seq=r + 1,
                )
            )
            # place atoms along a chain, 0.14 nm apart
            pos.append([0.14 * len(pos), 0.01 * i, 0.0])
    return Topology(atoms=atoms, bonds=[]), np.asarray(pos, np.float32)


def test_vocabularies():
    assert encode_atom_type("C") == 0 and encode_atom_type("S") == 4
    assert encode_atom_type("Zn") == 5  # unknown
    assert encode_atom_code("CA") == 4
    assert encode_residue("ALA") == 0 and encode_residue("NME") == 21
    assert len(ResidueMetadata.RESIDUE_CODES) == 22
    assert convert_to_three_letter_codes("AG") == "ALA_GLY"
    assert convert_to_one_letter_codes("ALA_GLY") == "AG"


def test_pdb_roundtrip(tmp_path):
    top, pos = _dipeptide_topology()
    path = str(tmp_path / "test.pdb")
    save_pdb(path, top, np.stack([pos, pos + 0.01]))
    top2, pos2 = load_pdb(path)
    assert top2.n_atoms == top.n_atoms
    assert pos2.shape == (2, top.n_atoms, 3)
    np.testing.assert_allclose(pos2[0], pos, atol=1e-3)
    assert [a.name for a in top2.atoms] == [a.name for a in top.atoms]
    assert top2.n_residues == 2
    # bond inference found the chain bonds
    assert len(top2.bonds) >= top.n_atoms - 2


def test_dcd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pos = rng.standard_normal((5, 12, 3)).astype(np.float32)
    path = str(tmp_path / "test.dcd")
    write_dcd(path, pos)
    pos2 = read_dcd(path)
    np.testing.assert_allclose(pos2, pos, atol=1e-5)


def test_preprocess_topology():
    top, pos = _dipeptide_topology()
    template, heavy_top, top_h = preprocess_topology(top, pos)
    assert template.num_atoms == 8
    assert template.num_residues == 2
    np.testing.assert_array_equal(np.unique(template.residue_sequence_index), [0, 1])
    # directed bonds: both directions present
    assert len(template.bond_src) == 2 * len(heavy_top.bonds)
    assert template.atom_code_index[1] == 4  # CA


def test_collate_padding():
    top, pos = _dipeptide_topology()
    template, _, _ = preprocess_topology(top, pos)
    batch = collate([(template, pos[: template.num_atoms])] * 3, BucketSpec(node_buckets=(16,)), num_graphs=4)
    assert batch.pos.shape == (4, 16, 3)
    assert batch.node_mask.sum() == 3 * 8
    assert bool(batch.graph_mask[3]) is False
    assert batch.bond_mask.shape[1] >= len(template.bond_src)


def test_dataset_and_discovery(tmp_path):
    from jamun_tpu.data.discovery import parse_datasets_from_directory

    top, pos = _dipeptide_topology()
    traj = np.stack([pos + 0.001 * i for i in range(10)])
    save_pdb(str(tmp_path / "AG-traj-state0.pdb"), top, pos)
    np.savez(str(tmp_path / "AG-traj-arrays.npz"), positions=traj)
    datasets = parse_datasets_from_directory(
        root=str(tmp_path),
        traj_pattern=r"^(.*)-traj-arrays.npz",
        pdb_pattern=r"^(.*)-traj-state0.pdb",
    )
    assert len(datasets) == 1
    ds = datasets[0]
    assert ds.label() == "AG"
    assert len(ds) == 10
    template, frame = ds[3]
    assert frame.shape == (template.num_atoms, 3)
    # subsampling
    ds2_list = parse_datasets_from_directory(
        root=str(tmp_path),
        traj_pattern=r"^(.*)-traj-arrays.npz",
        pdb_pattern=r"^(.*)-traj-state0.pdb",
        subsample=2,
    )
    assert len(ds2_list[0]) == 5


def test_streaming_interleave(tmp_path):
    from jamun_tpu.data.datasets import StreamingRandomChainDataset

    class FakeDS:
        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __iter__(self):
            return iter([(self.tag, i) for i in range(self.n)])

    stream = StreamingRandomChainDataset([FakeDS("a", 3), FakeDS("b", 2)], weights=[1, 1])
    it = iter(stream)
    items = [next(it) for _ in range(20)]  # far beyond dataset sizes: must re-open
    assert {t for t, _ in items} == {"a", "b"}


def test_average_squared_distance():
    from jamun_tpu.utils.average_squared_distance import compute_average_squared_distance

    pos = np.asarray([[0, 0, 0], [0.3, 0, 0], [10.0, 0, 0]])
    v = compute_average_squared_distance(pos, cutoff=1.0)
    np.testing.assert_allclose(v, 0.09, rtol=1e-6)


def test_datamodule_bucket_grouping(tmp_path):
    """Batches group same-bucket graphs so XLA shape count stays bounded."""
    from jamun_tpu.data.datamodule import DataModule
    from jamun_tpu.data.datasets import TrajectoryDataset

    # two datasets with different molecule sizes
    for code, n_res in [("AA", 2), ("BBBB", 5)]:
        top, pos = _dipeptide_topology()
        # grow the second synthetic molecule
        if n_res == 5:
            import copy

            atoms = []
            pos_list = []
            for r in range(5):
                for a, p in zip(top.atoms[:4], pos[:4]):
                    atoms.append(
                        Atom(index=len(atoms), name=a.name, element=a.element,
                             residue_name=a.residue_name, residue_index=r, residue_seq=r + 1)
                    )
                    pos_list.append(p + np.asarray([0.5 * r, 0, 0]))
            top = Topology(atoms=atoms, bonds=[])
            pos = np.asarray(pos_list, np.float32)
        save_pdb(str(tmp_path / f"{code}-traj-state0.pdb"), top, pos)
        traj = np.stack([pos + 0.001 * i for i in range(12)])
        np.savez(str(tmp_path / f"{code}-traj-arrays.npz"), positions=traj)

    from jamun_tpu.data.discovery import parse_datasets_from_directory

    datasets = parse_datasets_from_directory(
        root=str(tmp_path),
        traj_pattern=r"^(.*)-traj-arrays.npz",
        pdb_pattern=r"^(.*)-traj-state0.pdb",
    )
    dm = DataModule(datasets=datasets, batch_size=4, prefetch=0, seed=0)
    shapes = set()
    for batch in dm.train_batches(0):
        shapes.add(batch.pos.shape)
        # every batch contains graphs from one node bucket only
        counts = np.asarray(batch.node_mask).sum(axis=1)
        real = counts[np.asarray(batch.graph_mask)]
        buckets = {dm.bucket_spec.node_bucket(int(c)) for c in real}
        assert len(buckets) == 1
    assert len(shapes) <= 2  # one shape per bucket
