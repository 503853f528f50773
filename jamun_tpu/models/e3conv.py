"""E3Conv: NequIP-style E(3)-equivariant message-passing denoiser architecture.

Reference: `/root/reference/src/jamun/model/arch/e3conv.py:12-138` and default
hyperparameters from `hydra_config/model/arch/e3conv.yaml` (5 layers, hidden
`120x0e + 32x1e`, SH `1x0e + 1x1e`, out `1x1e`, edge_attr_dim 64).

TPU-first differences: operates on dense padded [G, N] batches with masked
N x N adjacency (see `jamun_tpu.ops.graph`); edge features (SH, radial basis,
bondedness embedding) are computed once per forward and shared by all layers.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from jamun_tpu.models.embeddings import AtomEmbeddingWithResidueInformation, SimpleAtomEmbedding
from jamun_tpu.models.noise_conditioning import NoiseConditionalScaling, NoiseConditionalSkipConnection
from jamun_tpu.ops.conv import ConvBlock
from jamun_tpu.ops.graph import GraphBatch, dense_edge_data
from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.mlp import EquivariantMLP
from jamun_tpu.ops.radial import soft_one_hot_linspace
from jamun_tpu.ops.sh import spherical_harmonics

__all__ = ["E3Conv", "vector_to_irreps", "irreps_to_vector", "neighbor_mode_auto"]

# "auto" neighbor-mode thresholds (measured on v5e, BENCH_NOTES round 4):
# below these atom counts the dense masked-adjacency path (and its Pallas
# kernels) wins; above them the capped-neighbor sparse path wins. Training
# flips earlier because the dense training path is plain XLA at N > 128
# (the gen-4 tiled kernel's backward loses to XLA, see tiled_kernel_training)
# while sampling keeps the tiled forward kernel.
_NBR_AUTO_TRAIN_N = 256
_NBR_AUTO_SAMPLE_N = 512


def neighbor_mode_auto(n_atoms: int, training: bool) -> bool:
    """True when "auto" neighbor mode resolves to the sparse path."""
    return n_atoms >= (_NBR_AUTO_TRAIN_N if training else _NBR_AUTO_SAMPLE_N)

_embed_init = nn.initializers.normal(stddev=1.0)

# 3D vectors are (x, y, z); the l=1 irrep component order is (y, z, x).
_XYZ_TO_YZX = jnp.array([1, 2, 0])
_YZX_TO_XYZ = jnp.array([2, 0, 1])


def vector_to_irreps(v: jnp.ndarray) -> jnp.ndarray:
    return v[..., _XYZ_TO_YZX]


def irreps_to_vector(f: jnp.ndarray) -> jnp.ndarray:
    return f[..., _YZX_TO_XYZ]


class _HiddenLayer(nn.Module):
    """One noise-conditioned message-passing layer (scan body).

    `transposed`: the whole layer runs in the kernel-native [G, C_rows, N]
    layout — scaling/skip as lane-broadcast elementwise ops and the ConvBlock
    via its transposed-I/O fused kernel, so consecutive layers chain with zero
    transposes. Params are identical to the untransposed layer (init always
    runs untransposed)."""

    irreps_hidden: str
    irreps_sh: str
    edge_attr_dim: int
    tensor_product: str
    dtype: Any
    use_pallas: bool
    pallas_variant: str = "packed"
    nbr_kernel: bool = False
    atom_axis: str = None
    transposed: bool = False

    @nn.compact
    def __call__(self, node_attr, edges, c_noise):
        irreps_hidden = Irreps(self.irreps_hidden)
        scaled = NoiseConditionalScaling(irreps_hidden)(
            node_attr, c_noise, transposed=self.transposed
        )
        layer_out = ConvBlock(
            irreps_in=irreps_hidden,
            irreps_out=irreps_hidden,
            irreps_sh=self.irreps_sh,
            edge_attr_dim=self.edge_attr_dim,
            tensor_product=self.tensor_product,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pallas_variant=self.pallas_variant,
            nbr_kernel=self.nbr_kernel,
            atom_axis=self.atom_axis,
        )(scaled, edges, transposed_in=self.transposed, transposed_out=self.transposed)
        out = NoiseConditionalSkipConnection(irreps_hidden)(
            node_attr, layer_out, c_noise, transposed=self.transposed
        )
        return out, None


class E3Conv(nn.Module):
    irreps_out: str = "1x1e"
    irreps_hidden: str = "120x0e + 32x1e"
    irreps_sh: str = "1x0e + 1x1e"
    n_layers: int = 5
    edge_attr_dim: int = 64
    atom_type_embedding_dim: int = 8
    atom_code_embedding_dim: int = 8
    residue_code_embedding_dim: int = 32
    residue_index_embedding_dim: int = 8
    use_residue_information: bool = True
    use_residue_sequence_index: bool = False
    tensor_product: str = "uvw"  # "uvw" = e3nn FullyConnectedTP (reference default)
    dtype: Any = None  # hot-path compute dtype, e.g. jnp.bfloat16 (params stay f32)
    use_pallas: bool = False  # fused VMEM conv kernel (uvu, l<=1 only)
    pallas_variant: str = "packed"  # lane-packed [N*N, C] kernel | "plane" [N, N, C]
    atom_axis: str = None  # shard_map axis name: atom-sharded large-molecule
    # mode (SURVEY 5.7) — batch holds this shard's local atom rows, node
    # features are all-gathered per conv layer (the halo exchange)
    scan_layers: bool = False  # lax.scan over the n identical hidden layers
    # (one layer compile instead of n; params gain a leading layer axis)
    fused_stack: bool = False  # SAMPLING-ONLY: run edge features + initial
    # projector + ALL hidden layers (incl. noise scaling/skip) + the head in
    # ONE pallas kernel (ops/pallas/e3_stack.py) — no per-layer HBM round
    # trips or kernel-boundary glue. Params are identical to the layer-by-
    # layer path (checkpoints interchange); not differentiable — training
    # configs must leave this off.
    neighbor_mode: str = "auto"  # "dense" | "nbr" | "auto" — edge execution
    # format. "dense": masked [N, N] adjacency (+ Pallas kernels; bit-exact
    # reference parity path). "nbr": capped K-nearest neighbor lists
    # (ops/neighbors.py) — O(N*K) message work, the large-molecule path
    # (train_idrome regime; the reference's own radius_graph caps in-degree
    # at 32, `torch_cluster` max_num_neighbors). "auto": dense below the
    # measured crossover (`neighbor_mode_auto`), sparse above — existing
    # peptide-scale recipes are unaffected.
    neighbor_cap: int = 32  # K for the sparse path (matches the reference's
    # radius_graph max_num_neighbors=32 default); dropped-edge counts are
    # sown as "neighbor_overflow" intermediates
    tiled_kernel_training: bool = False  # allow the gen-4 tiled kernel in
    # differentiated (training=True) calls at N > 128. Off by default: its
    # backward measured 2.2x SLOWER than XLA at N=256 b8 (63.6 vs 29.3
    # ms/step, BENCH_NOTES round 3e) while its FORWARD is 1.8x faster — so
    # training dispatches per-bucket (gen-3 kernels at N <= 128, XLA above)
    # and sampling keeps the tiled kernel. Benchmarking escape hatch only.

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        c_noise: jnp.ndarray,
        radial_cutoff: jnp.ndarray,
        training: bool = False,
        nbr_cache=None,
    ) -> jnp.ndarray:
        """batch.pos are the *scaled* noisy positions (c_in * y). Returns the
        per-atom output irreps array; for irreps_out="1x1e" use
        `irreps_to_vector` to get (x, y, z) displacements.

        `training`: the call will be differentiated — choose kernels whose
        BACKWARD is efficient. Static per trace, so bucketed training mixes
        paths per batch shape (gen-3 kernels at N <= 128, XLA above).

        `nbr_cache`: optional (nbr_idx, superset_mask) Verlet-cached neighbor
        lists from the walk (`sampling/mcmc.NeighborCachedScore`) — only
        meaningful when the sparse path is active; the O(N^2) per-forward
        list build is skipped and the true-cutoff mask is re-derived from
        current positions."""
        irreps_hidden = Irreps(self.irreps_hidden)
        irreps_sh = Irreps(self.irreps_sh)
        irreps_out = Irreps(self.irreps_out)

        bonded_dim = self.edge_attr_dim // 2
        radial_dim = (self.edge_attr_dim + 1) // 2
        bond_embed = self.param("embed_bondedness", _embed_init, (2, bonded_dim))

        def attr_fn(dist, bonded: bool):
            radial = soft_one_hot_linspace(dist, 0.0, radial_cutoff, radial_dim, basis="gaussian", cutoff=True)
            bond_vec = bond_embed[1] if bonded else bond_embed[0]
            bond_part = jnp.broadcast_to(bond_vec, dist.shape + (bonded_dim,))
            return jnp.concatenate([bond_part, radial], axis=-1)

        # atom-sharded mode: this shard holds local dst rows; gather the full
        # molecule once for edge construction (per-layer feature halos happen
        # inside Conv)
        src_pos = src_mask = dst_index = None
        if self.atom_axis is not None:

            src_pos = jax.lax.all_gather(batch.pos, self.atom_axis, axis=1, tiled=True)
            src_mask = jax.lax.all_gather(batch.node_mask, self.atom_axis, axis=1, tiled=True)
            n_loc = batch.pos.shape[1]
            dst_index = jax.lax.axis_index(self.atom_axis) * n_loc + jnp.arange(n_loc)
            dst_index = jnp.broadcast_to(dst_index[None, :], batch.pos.shape[:2])

        # under shard_map the local shard holds N/n_dev dst rows; "auto" must
        # see the FULL molecule size (axis_size is static)
        N_atoms_total = batch.pos.shape[1] * (
            1 if self.atom_axis is None else jax.lax.axis_size(self.atom_axis)
        )
        if self.neighbor_mode not in ("dense", "nbr", "auto"):
            raise ValueError(f"neighbor_mode={self.neighbor_mode!r}")
        nbr_on = self.neighbor_mode == "nbr" or (
            self.neighbor_mode == "auto" and neighbor_mode_auto(N_atoms_total, training)
        )
        nbr_kernel = False
        if nbr_on:
            # sparse capped-neighbor edges (ops/neighbors.py): only the
            # [G, N, K] kept-edge features are materialized; every dense
            # [N, N] path (incl. the Pallas kernels) is bypassed
            from jamun_tpu.ops.neighbors import neighbor_edge_data

            import os

            nbr_kernel = (
                self.use_pallas
                and not training
                and self.atom_axis is None
                and os.environ.get("JAMUN_NBR_KERNEL", "1") != "0"
            )
            _ihid = list(irreps_hidden)
            _Sh = _ihid[0].mul
            _Vh = _ihid[1].mul if len(_ihid) > 1 else 0
            # The Pallas edge-features kernel measured as a NEGATIVE on v5e at
            # N=1024 (walk 5.47-5.62 ms/step vs 5.27 with the XLA cached
            # edge-feature stage — XLA fuses the cached-list gather + sh +
            # radial well; BENCH_NOTES round 5a). Kept behind an env flag for
            # re-probing on other shapes/backends.
            if (
                nbr_cache is not None
                and nbr_kernel
                and os.environ.get("JAMUN_NBR_GEOM_KERNEL", "0") == "1"
            ):
                from jamun_tpu.ops.pallas.nbr_conv import (
                    nbr_edge_features,
                    supports_nbr_conv,
                )

                geom_ok = supports_nbr_conv(
                    _Sh, _Vh, irreps_sh.dim, self.edge_attr_dim, self.edge_attr_dim,
                    int(nbr_cache[0].shape[-1]),
                )
            else:
                geom_ok = False
            if geom_ok:
                # cached-list kernel path: ONE edge-features kernel per
                # forward (block-sparse pos gather + sh + radial basis +
                # true-cutoff mask in VMEM) feeding the per-layer conv
                # kernels; attr is the radial half only — Conv folds the
                # constant bondedness block into the radial-MLP bias
                sh_nbr, rad_nbr, mask_f, idxf = nbr_edge_features(
                    batch.pos,
                    nbr_cache[0],
                    nbr_cache[1],
                    radial_cutoff,
                    n_radial=radial_dim,
                    interpret=jax.default_backend() not in ("tpu", "axon"),
                    compute_dtype=self.dtype,
                )
                edges = dense_edge_data(
                    batch.pos,
                    batch.node_mask,
                    batch.bond_src,
                    batch.bond_dst,
                    batch.bond_mask,
                    radial_cutoff,
                    sh_fn=functools.partial(spherical_harmonics, irreps_sh),
                    attr_fn=attr_fn,
                    dense=False,
                    bond0_embed=bond_embed[0],
                    bond1_embed=bond_embed[1],
                ).replace(
                    nbr_idx=idxf, nbr_mask=mask_f, sh_nbr=sh_nbr, attr_nbr=rad_nbr
                )
                nbr_overflow = None
            else:
                edges, nbr_overflow = neighbor_edge_data(
                    batch.pos,
                    batch.node_mask,
                    batch.bond_src,
                    batch.bond_dst,
                    batch.bond_mask,
                    radial_cutoff,
                    sh_fn=functools.partial(spherical_harmonics, irreps_sh),
                    attr_fn=attr_fn,
                    cap=self.neighbor_cap,
                    bond0_embed=bond_embed[0],
                    bond1_embed=bond_embed[1],
                    src_pos=src_pos,
                    src_mask=src_mask,
                    dst_index=dst_index,
                    cache=nbr_cache,
                )
            # cap telemetry (edges dropped per graph); retrieve via
            # `capture_intermediates`/mutable, reported by the bench harness.
            # Cached-list mode counts overflow at rebuild time (in the walk),
            # not here. The fused sparse-conv kernel (ops/pallas/nbr_conv.py)
            # is forward-only — differentiated calls keep the XLA sparse path;
            # kill switch JAMUN_NBR_KERNEL=0 (runtime fallback stays
            # `step_with_fallback`).
            if nbr_overflow is not None:
                self.sow("intermediates", "neighbor_overflow", nbr_overflow)
        else:
            # dense edge features for the XLA paths (unused ones are DCE'd by XLA)
            edges = dense_edge_data(
                batch.pos,
                batch.node_mask,
                batch.bond_src,
                batch.bond_dst,
                batch.bond_mask,
                radial_cutoff,
                sh_fn=functools.partial(spherical_harmonics, irreps_sh),
                attr_fn=attr_fn,
                dense=True,
                bond0_embed=bond_embed[0],
                bond1_embed=bond_embed[1],
                src_pos=src_pos,
                src_mask=src_mask,
                dst_index=dst_index,
            )
        # gate the precompute on the same backend-aware shape bounds the conv
        # kernels enforce (S/V from the hidden layers, which consume it), so
        # it is never dead work when Conv would fall back to the XLA path
        _hsv = (irreps_hidden[0].mul, irreps_hidden[1].mul if len(irreps_hidden) > 1 else 0)
        from jamun_tpu.ops.pallas.packed_conv import (
            supports_packed_conv,
            tiled_shape_bounds_ok,
        )

        N_atoms = batch.pos.shape[1]
        # training dispatch: the gen-4 tiled kernel's backward is slower than
        # XLA (see `tiled_kernel_training`), so differentiated calls at
        # N > 128 take the XLA path wholesale
        use_pallas = self.use_pallas and not (
            training and N_atoms > 128 and not self.tiled_kernel_training
        )
        # the whole-model stack kernel is forward-only (no custom VJP):
        # differentiated calls must fall back to the per-layer path, which
        # has a backward kernel / XLA autodiff. All Pallas kernels (and their
        # packed-edge precomputes) are dense-only: sparse neighbor mode
        # bypasses them wholesale.
        stack_on = (
            use_pallas
            and not training
            and not nbr_on
            and self._stack_ok(batch, irreps_hidden, irreps_sh, irreps_out, c_noise)
        )
        if (
            not stack_on  # the stack kernel builds edge features in-kernel
            and not nbr_on
            and use_pallas
            and self.pallas_variant == "packed"
            and self.tensor_product == "uvu"
            and self.atom_axis is None
            and tiled_shape_bounds_ok(N_atoms, _hsv[0], _hsv[1])
            # mirror Conv._pallas_supported's structural checks too (sh dim,
            # edge_attr/radial widths): otherwise e.g. edge_attr_dim=32 would
            # precompute [G, EFR, N^2] features every forward that every conv
            # then ignores on its XLA fallback path
            and supports_packed_conv(
                _hsv[0], _hsv[1], irreps_sh.dim, self.edge_attr_dim, self.edge_attr_dim
            )
            and not self.is_initializing()
        ):
            # per-forward kernel inputs IDENTICAL for all conv layers: compute
            # once. N <= 128 (gen-3 kernel): lane-packed edge features;
            # N > 128 (gen-4 tiled kernel): position rows + bond features —
            # the dense-pair geometry is rebuilt in-kernel per dst block.

            if N_atoms <= 128:
                from jamun_tpu.ops.pallas.packed_conv import packed_edge_features

                ef, bf, ebsT, ebd = packed_edge_features(
                    batch.pos,
                    batch.node_mask,
                    batch.bond_src,
                    batch.bond_dst,
                    batch.bond_mask,
                    radial_cutoff,
                    n_radial=radial_dim,
                    interpret=jax.default_backend() not in ("tpu", "axon"),
                    compute_dtype=self.dtype,
                )
                edges = edges.replace(
                    ef_packed=ef, bf_packed=bf, ebsT_packed=ebsT, ebd_packed=ebd
                )
            else:
                from jamun_tpu.ops.pallas.packed_conv import packed_geometry_inputs

                posm, bf, ebsT, ebd = packed_geometry_inputs(
                    batch.pos,
                    batch.node_mask,
                    batch.bond_src,
                    batch.bond_dst,
                    batch.bond_mask,
                    radial_cutoff,
                    n_radial=radial_dim,
                    compute_dtype=self.dtype,
                )
                edges = edges.replace(
                    posm_packed=posm, bf_packed=bf, ebsT_packed=ebsT, ebd_packed=ebd
                )

        if self.use_residue_information:
            embedder = AtomEmbeddingWithResidueInformation(
                self.atom_type_embedding_dim,
                self.atom_code_embedding_dim,
                self.residue_code_embedding_dim,
                self.residue_index_embedding_dim,
                self.use_residue_sequence_index,
            )
        else:
            embedder = SimpleAtomEmbedding(
                embedding_dim=self.atom_type_embedding_dim
                + self.atom_code_embedding_dim
                + self.residue_code_embedding_dim
                + self.residue_index_embedding_dim
            )
        node_attr = embedder(batch)
        irreps_node = embedder.irreps_out

        # zero-transpose chained kernel mode: when every hidden layer will run
        # the fused-block kernel, the whole stack (initial projector -> hidden
        # layers -> head) stays in the kernel-native [C, N] layout — no
        # [C,N] <-> [N,C] transposes at layer boundaries (they were measured as
        # part of the walk step's fixed overhead, BENCH_NOTES round 2)
        chained = (
            use_pallas
            and not nbr_on
            and self._chained_ok(batch, irreps_node, irreps_hidden, irreps_sh, irreps_out)
        )

        node_attr = NoiseConditionalScaling(irreps_node)(node_attr, c_noise)

        if stack_on:
            # SAMPLING fast path: the ENTIRE remaining forward (edge features,
            # initial projector, all hidden layers with noise scaling/skips,
            # EquivariantMLP head) runs in ONE pallas kernel
            node_attr = self._fused_stack(
                batch, node_attr, c_noise, radial_cutoff,
                irreps_hidden, irreps_out, bond_embed,
            )
            output_gain = self.param("output_gain", nn.initializers.zeros, ())
            node_attr = node_attr * output_gain
            return node_attr * batch.node_mask[..., None]

        node_attr = ConvBlock(
            irreps_in=irreps_node,
            irreps_out=irreps_hidden,
            irreps_sh=irreps_sh,
            edge_attr_dim=self.edge_attr_dim,
            tensor_product=self.tensor_product,
            dtype=self.dtype,
            # the initial projector's irreps_in is the (0e-only) embedding:
            # the lane-packed kernel (and the SoA fast path) handle V = 0
            use_pallas=use_pallas,
            pallas_variant=self.pallas_variant,
            nbr_kernel=nbr_kernel,
            atom_axis=self.atom_axis,
        )(node_attr, edges, transposed_out=chained)

        layer_kwargs = dict(
            irreps_hidden=self.irreps_hidden,
            irreps_sh=self.irreps_sh,
            edge_attr_dim=self.edge_attr_dim,
            tensor_product=self.tensor_product,
            dtype=self.dtype,
            use_pallas=use_pallas,
            pallas_variant=self.pallas_variant,
            nbr_kernel=nbr_kernel,
            atom_axis=self.atom_axis,
            transposed=chained,
        )
        if self.scan_layers:
            ScannedLayer = nn.scan(
                _HiddenLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.n_layers,
            )
            node_attr, _ = ScannedLayer(**layer_kwargs)(node_attr, edges, c_noise)
        else:
            for _ in range(self.n_layers):
                node_attr, _ = _HiddenLayer(**layer_kwargs)(node_attr, edges, c_noise)

        if chained:
            node_attr = self._transposed_head(node_attr, irreps_hidden, irreps_out)
        else:
            node_attr = EquivariantMLP(
                irreps_in=irreps_hidden,
                irreps_out=irreps_out,
                irreps_hidden_list=[irreps_hidden],
            )(node_attr)
        output_gain = self.param("output_gain", nn.initializers.zeros, ())
        node_attr = node_attr * output_gain
        return node_attr * batch.node_mask[..., None]

    def _chained_ok(self, batch, irreps_node, irreps_hidden, irreps_sh, irreps_out) -> bool:
        """True when the whole hidden stack will run the fused-block kernel
        with transposed I/O — mirrors `ConvBlock._fused_block_supported` /
        `Conv._pallas_supported` for both the initial projector (V = 0) and
        the hidden layers, plus the l<=1 head the transposed head supports."""
        from jamun_tpu.ops.pallas.packed_conv import supports_packed_conv, tiled_shape_bounds_ok

        if not (
            self.use_pallas
            and self.pallas_variant == "packed"
            and self.tensor_product == "uvu"
            and self.atom_axis is None
            and not self.is_initializing()
        ):
            return False
        hid = list(irreps_hidden)
        canonical_hidden = (
            len(hid) == 2
            and hid[0].ir.l == 0 and hid[0].ir.p == 1
            and hid[1].ir.l == 1 and hid[1].ir.p == 1
            and hid[1].mul > 0
        )
        if not canonical_hidden:
            return False
        head_ok = all(mi.ir.l <= 1 and mi.ir.p == 1 for mi in irreps_out)
        S_h, V_h = hid[0].mul, hid[1].mul
        S_emb = Irreps(irreps_node)[0].mul
        N = batch.pos.shape[1]
        return (
            head_ok
            and supports_packed_conv(S_h, V_h, irreps_sh.dim, self.edge_attr_dim, self.edge_attr_dim)
            and tiled_shape_bounds_ok(N, S_h, V_h)
            and tiled_shape_bounds_ok(N, S_emb, 0)
        )

    def _stack_ok(self, batch, irreps_hidden, irreps_sh, irreps_out, c_noise) -> bool:
        """True when the whole-model stack kernel (`ops/pallas/e3_stack.py`)
        can run: the chained fused-block regime at N <= 64 (see
        `stack_supported` for the compile-time rationale behind the cap),
        per-layer params addressable by name (no scan stacking), and a single
        noise level (the walk's case — sampling uses one sigma per step)."""
        if not (self.fused_stack and not self.scan_layers):
            return False
        if not (
            self.use_pallas
            and self.pallas_variant == "packed"
            and self.tensor_product == "uvu"
            and self.atom_axis is None
            and not self.is_initializing()
        ):
            return False
        hid = list(irreps_hidden)
        canonical_hidden = (
            len(hid) == 2
            and hid[0].ir.l == 0 and hid[0].ir.p == 1
            and hid[1].ir.l == 1 and hid[1].ir.p == 1
            and hid[1].mul > 0
        )
        if not canonical_hidden or c_noise.size != 1:
            return False
        from jamun_tpu.ops.pallas.e3_stack import stack_supported
        from jamun_tpu.ops.pallas.packed_conv import supports_packed_conv

        S_emb = (
            self.atom_type_embedding_dim
            + self.atom_code_embedding_dim
            + self.residue_code_embedding_dim
            + self.residue_index_embedding_dim
        )
        S_h, V_h = hid[0].mul, hid[1].mul
        out_blocks_final = tuple((mi.mul, mi.ir.l, mi.ir.p) for mi in irreps_out)
        return supports_packed_conv(
            S_h, V_h, irreps_sh.dim, self.edge_attr_dim, self.edge_attr_dim
        ) and stack_supported(batch.pos.shape[1], S_h, V_h, S_emb, out_blocks_final)

    def _fused_stack(
        self, batch, nf0, c_noise, radial_cutoff, irreps_hidden, irreps_out, bond_embed
    ) -> jnp.ndarray:
        """Collect the (init-created) projector / per-layer / head params by
        name and run the whole forward in one kernel. Param layout is
        identical to the layer-by-layer path — checkpoints interchange."""
        import jax

        from jamun_tpu.ops.pallas.e3_stack import packed_e3conv_stack

        S, V = irreps_hidden[0].mul, irreps_hidden[1].mul
        S_emb = nf0.shape[-1]
        n_radial = (self.edge_attr_dim + 1) // 2
        interpret = jax.default_backend() not in ("tpu", "axon")

        def block_w(p):
            cp = p["Conv_0"]
            rp = cp["radial_nn"]
            return (
                rp["Dense_0"]["kernel"], rp["Dense_0"]["bias"],
                rp["Dense_1"]["kernel"], rp["Dense_1"]["bias"],
                dict(cp["_post_linear"]),
                dict(p["IrrepsLinear_1"]),  # second linear
                dict(p["IrrepsLinear_0"]),  # linear skip
            )

        proj_w = block_w(self.get_variable("params", "ConvBlock_0"))
        layer_ps = [
            self.get_variable("params", f"_HiddenLayer_{i}")
            for i in range(self.n_layers)
        ]
        layers_w = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[block_w(p["ConvBlock_0"]) for p in layer_ps]
        )

        from jamun_tpu.models.noise_conditioning import _ScalePredictor

        def scale_mlp(p, c):
            # apply the REAL module on the collected param subtree so this
            # path can never silently diverge from the layerwise forward
            return _ScalePredictor(S + V).apply({"params": p}, c)[0]  # [S + V]

        scales = jnp.stack(
            [
                scale_mlp(p["NoiseConditionalScaling_0"]["_ScalePredictor_0"], c_noise)
                for p in layer_ps
            ]
        )
        skipw = jax.nn.sigmoid(
            jnp.stack(
                [
                    scale_mlp(
                        p["NoiseConditionalSkipConnection_0"]["_ScalePredictor_0"], c_noise
                    )
                    for p in layer_ps
                ]
            )
        )

        hp = self.get_variable("params", "EquivariantMLP_0")
        head_blk = dict(hp["EquivariantMLPBlock_0"]["IrrepsLinear_0"])
        head_fin = dict(hp["IrrepsLinear_0"])
        out_blocks_final = tuple((mi.mul, mi.ir.l) for mi in irreps_out)

        return packed_e3conv_stack(
            batch.pos, batch.node_mask, batch.bond_src, batch.bond_dst,
            batch.bond_mask > 0, radial_cutoff, nf0,
            proj_w, layers_w, scales, skipw, head_blk, head_fin,
            bond_embed[0], bond_embed[1], out_blocks_final,
            S=S, V=V, S_emb=S_emb, n_radial=n_radial,
            interpret=interpret, compute_dtype=self.dtype,
        )

    def _transposed_head(self, xT, irreps_hidden, irreps_out) -> jnp.ndarray:
        """The EquivariantMLP head applied in the kernel-native transposed
        layout, reading the (init-created) `EquivariantMLP_0` params by name.
        xT: [G, Sp + 3*Vp, N] -> [G, N, irreps_out.dim] (packed layout)."""
        import math

        import jax

        from jamun_tpu.ops.pallas.packed_conv import _pad16
        from jamun_tpu.ops.precision import matmul_precision

        S, V = irreps_hidden[0].mul, irreps_hidden[1].mul
        Sp, Vp = _pad16(S), _pad16(V)
        cdt = self.dtype or xT.dtype
        prec = matmul_precision(cdt)
        p = self.get_variable("params", "EquivariantMLP_0")
        blk = p["EquivariantMLPBlock_0"]["IrrepsLinear_0"]
        fin = p["IrrepsLinear_0"]

        def lin(w, fan, x):
            return jnp.einsum(
                "uw,gun->gwn", w.astype(cdt) / math.sqrt(max(fan, 1)), x, precision=prec
            )

        xs = xT[:, 0:S].astype(cdt)
        xv = [xT[:, Sp + c * Vp : Sp + c * Vp + V].astype(cdt) for c in range(3)]
        # EquivariantMLPBlock: IrrepsLinear(hidden -> gate.irreps_in) + Gate
        s_pre = lin(blk["w_0_0"], S, xs)          # scalars [G, S, N]
        gates = jax.nn.sigmoid(lin(blk["w_0_1"], S, xs))  # [G, V, N]
        v_pre = [lin(blk["w_1_2"], V, xv[c]) for c in range(3)]
        s_act = jax.nn.leaky_relu(s_pre, 0.01)
        gated = [v_pre[c] * gates for c in range(3)]
        # final IrrepsLinear(gate.irreps_out [(S,0e),(V,1e)] -> irreps_out)
        G, N = xT.shape[0], xT.shape[-1]
        out_parts = []
        for j, mi in enumerate(irreps_out):
            if mi.ir.l == 0:
                o = lin(fin[f"w_0_{j}"], S, s_act)  # [G, mul, N]
                out_parts.append(jnp.swapaxes(o, -1, -2))
            else:
                comps = [lin(fin[f"w_1_{j}"], V, gated[c]) for c in range(3)]
                o = jnp.stack(comps, axis=-1)  # [G, mul, N, 3]
                out_parts.append(jnp.swapaxes(o, 1, 2).reshape(G, N, 3 * mi.mul))
        return jnp.concatenate(out_parts, axis=-1)
