from jamun_tpu.data.batching import BucketSpec, collate, pad_to_bucket, template_to_batch
from jamun_tpu.data.datamodule import DataModule
from jamun_tpu.data.datasets import (
    IterableTrajectoryDataset,
    StreamingRandomChainDataset,
    TrajectoryDataset,
)
from jamun_tpu.data.dcd import read_dcd, write_dcd
from jamun_tpu.data.discovery import create_dataset_from_pdbs, parse_datasets_from_directory
from jamun_tpu.data.residue_metadata import (
    ResidueMetadata,
    encode_atom_code,
    encode_atom_type,
    encode_residue,
)
from jamun_tpu.data.topology import (
    GraphTemplate,
    Topology,
    load_pdb,
    preprocess_topology,
    save_pdb,
)
