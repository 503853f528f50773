"""Atom embedders (reference `/root/reference/src/jamun/model/atom_embedding.py`)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from jamun_tpu.ops.graph import GraphBatch
from jamun_tpu.ops.irreps import Irreps

__all__ = ["SimpleAtomEmbedding", "AtomEmbeddingWithResidueInformation", "CoarseGrainedBeadEmbedding"]

_embed_init = nn.initializers.normal(stddev=1.0)  # torch nn.Embedding default N(0,1)


class SimpleAtomEmbedding(nn.Module):
    """Atom-type-only embedding (`atom_embedding.py:21`)."""

    embedding_dim: int
    max_value: int = 20

    @property
    def irreps_out(self) -> Irreps:
        return Irreps(f"{self.embedding_dim}x0e")

    @nn.compact
    def __call__(self, batch: GraphBatch) -> jnp.ndarray:
        return nn.Embed(self.max_value, self.embedding_dim, embedding_init=_embed_init)(
            batch.atom_type_index
        )


class AtomEmbeddingWithResidueInformation(nn.Module):
    """Concat of atom-type/atom-code/residue-code/residue-seq-index embeddings
    (`atom_embedding.py:33-76`). Sequence index is zeroed unless
    `use_residue_sequence_index`."""

    atom_type_embedding_dim: int
    atom_code_embedding_dim: int
    residue_code_embedding_dim: int
    residue_index_embedding_dim: int
    use_residue_sequence_index: bool = False
    num_atom_types: int = 20
    max_sequence_length: int = 10
    num_atom_codes: int = 10
    num_residue_types: int = 25

    @property
    def irreps_out(self) -> Irreps:
        dim = (
            self.atom_type_embedding_dim
            + self.atom_code_embedding_dim
            + self.residue_code_embedding_dim
            + self.residue_index_embedding_dim
        )
        return Irreps(f"{dim}x0e")

    @nn.compact
    def __call__(self, batch: GraphBatch) -> jnp.ndarray:
        feats = [
            nn.Embed(self.num_atom_types, self.atom_type_embedding_dim, embedding_init=_embed_init)(
                batch.atom_type_index
            ),
            nn.Embed(self.num_atom_codes, self.atom_code_embedding_dim, embedding_init=_embed_init)(
                batch.atom_code_index
            ),
            nn.Embed(
                self.num_residue_types, self.residue_code_embedding_dim, embedding_init=_embed_init
            )(batch.residue_code_index),
        ]
        seq = batch.residue_sequence_index
        if not self.use_residue_sequence_index:
            seq = jnp.zeros_like(seq)
        feats.append(
            nn.Embed(
                self.max_sequence_length, self.residue_index_embedding_dim, embedding_init=_embed_init
            )(jnp.clip(seq, 0, self.max_sequence_length - 1))
        )
        return jnp.concatenate(feats, axis=-1)


class CoarseGrainedBeadEmbedding(nn.Module):
    """Coarse-grained bead embedding for IDRome-CG (`atom_embedding.py:9`)."""

    bead_embedding_dim: int
    num_beads: int = 10

    @property
    def irreps_out(self) -> Irreps:
        return Irreps(f"{self.bead_embedding_dim}x0e")

    @nn.compact
    def __call__(self, batch: GraphBatch) -> jnp.ndarray:
        return nn.Embed(self.num_beads, self.bead_embedding_dim, embedding_init=_embed_init)(
            batch.atom_type_index
        )
