"""Equivariant graph convolution on dense padded batches — the hot loop.

Per edge: tp(node_attr[src], edge_sh, radial_nn(edge_attr)), mean-aggregated
over incoming edges. The reference implements this with torch_cluster +
torch_scatter CUDA kernels (`/root/reference/src/jamun/e3tools/nn/_conv.py:96-118`);
here the radial-weight generation is one large MXU matmul over all N^2 pairs
and aggregation is a masked reduction over the src axis — no scatter at all.
Bonded edges (a small static edge list) are added via per-graph segment_sum.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from jamun_tpu.ops.gate import Gate
from jamun_tpu.ops.graph import EdgeData
from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.linear import IrrepsLinear
from jamun_tpu.ops.mlp import ScalarMLP
from jamun_tpu.ops.tensor_product import depthwise_tp, fully_connected_tp

__all__ = ["Conv", "SeparableConv", "ExperimentalConv", "ConvBlock"]


def _segment_sum_per_graph(messages: jnp.ndarray, dst: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """messages: [G, B, D], dst: [G, B] -> [G, N, D] (sum of messages per dst node)."""
    return jax.vmap(lambda m, d: jax.ops.segment_sum(m, d, num_segments=num_nodes))(messages, dst)


class Conv(nn.Module):
    """Tensor-field-network convolution (arXiv 1802.08219), dense-batch form."""

    irreps_in: Union[str, Irreps]
    irreps_out: Union[str, Irreps]
    irreps_sh: Union[str, Irreps]
    edge_attr_dim: int
    radial_hidden: Optional[Sequence[int]] = None  # default: [edge_attr_dim]
    tensor_product: str = "uvw"  # "uvw" (fully connected) | "uvu" (separable)
    dtype: Any = None  # compute dtype for the hot path (params stay float32)
    use_pallas: bool = False  # fused VMEM kernel for the dense radial part
    pallas_variant: str = "packed"  # "packed" (lane-packed [N*N, C]) | "plane" ([N, N, C])
    pallas_graphs_per_program: int = 1  # plane-kernel tiling: graphs per grid program
    fast_path: bool = True  # SoA component-plane XLA path for l<=1 uvu
    nbr_kernel: bool = False  # fused Pallas kernel for the sparse capped-
    # neighbor path (ops/pallas/nbr_conv.py) — forward-only; the caller
    # (E3Conv) gates on `training` so differentiated calls keep XLA
    atom_axis: Optional[str] = None  # shard_map axis name for atom-sharded mode
    # (SURVEY 5.7): node features are all-gathered per layer (the halo) and
    # messages computed into this shard's local dst rows

    def setup(self):
        irreps_in = Irreps(self.irreps_in)
        irreps_out = Irreps(self.irreps_out)
        irreps_sh = Irreps(self.irreps_sh)
        if self.tensor_product == "uvw":
            self.tp = fully_connected_tp(irreps_in, irreps_sh, irreps_out)
            self._post_linear = None
        elif self.tensor_product == "uvu":
            self.tp, irreps_dtp = depthwise_tp(irreps_in, irreps_sh, irreps_out)
            self._post_linear = IrrepsLinear(irreps_dtp, irreps_out)
        elif self.tensor_product == "experimental":
            from jamun_tpu.ops.experimental_tp import ExperimentalTensorProduct

            self.tp = ExperimentalTensorProduct(irreps_in, irreps_sh, irreps_out)
            self._post_linear = None
        else:
            raise ValueError(self.tensor_product)
        hidden = list(self.radial_hidden) if self.radial_hidden is not None else [self.edge_attr_dim]
        self.radial_nn = ScalarMLP(
            out_features=self.tp.weight_numel, hidden_features=hidden, dtype=self.dtype
        )

    def _sv_shape(self):
        """(S, V) if irreps_in is the l<=1 SoA-compatible shape, else None.
        Accepts `Sx0e` (V = 0, e.g. the embedding projector) and `Sx0e + Vx1e`."""
        irreps_in = Irreps(self.irreps_in)
        if len(irreps_in) == 1 and irreps_in[0].ir.l == 0 and irreps_in[0].ir.p == 1:
            return irreps_in[0].mul, 0
        if (
            len(irreps_in) == 2
            and irreps_in[0].ir.l == 0
            and irreps_in[0].ir.p == 1
            and irreps_in[1].ir.l == 1
            and irreps_in[1].ir.p == 1
        ):
            return irreps_in[0].mul, irreps_in[1].mul
        return None

    def _pallas_supported(
        self, node_attr: jnp.ndarray, edges: EdgeData, n_atoms: int = None,
        tiled: bool = False,
    ) -> bool:
        sv = self._sv_shape()
        if sv is None:
            return False
        S, V = sv
        if n_atoms is None:
            n_atoms = node_attr.shape[1]
        if self.pallas_variant == "packed":
            from jamun_tpu.ops.pallas.packed_conv import supports_packed_conv as supports
        else:
            from jamun_tpu.ops.pallas.fused_conv import supports_fused_conv as supports

        shapes_ok = self.radial_hidden is None or list(self.radial_hidden) == [self.edge_attr_dim]
        # backend-aware shape bounds (shared with the E3Conv edge-feature
        # precompute gate). `tiled` (the gen-4 fused-block kernel) has no
        # N <= 128 VMEM ceiling — the dense pair panel is streamed per dst
        # block; the standalone layer kernel keeps the round-2 bounds.
        if self.pallas_variant == "packed":
            from jamun_tpu.ops.pallas.packed_conv import (
                packed_shape_bounds_ok,
                tiled_shape_bounds_ok,
            )

            bounds = tiled_shape_bounds_ok if tiled else packed_shape_bounds_ok
            shapes_ok = shapes_ok and bounds(n_atoms, S, V)
        elif jax.default_backend() in ("tpu", "axon"):
            shapes_ok = shapes_ok and 16 <= n_atoms <= 128 and S >= 32 and (V == 0 or V >= 16)
        return (
            self.use_pallas
            and self.atom_axis is None
            and self.tensor_product == "uvu"
            and not self.is_initializing()
            and edges.nbr_idx is None  # sparse neighbor mode: kernels are dense
            and edges.pos is not None
            and edges.bond0_embed is not None
            and shapes_ok
            and supports(
                S, V, Irreps(self.irreps_sh).dim, self.edge_attr_dim, self.edge_attr_dim
            )
        )

    def _fused_layer_supported(self, edges: EdgeData) -> bool:
        """The full-layer kernel additionally needs the post-linear (uvu only),
        a parity-even l<=1 irreps_out, and both bondedness embedding rows."""
        if self._post_linear is None or edges.bond1_embed is None:
            return False
        irreps_out = Irreps(self.irreps_out)
        return all(mi.ir.l in (0, 1) and mi.ir.p == 1 for mi in irreps_out) and any(
            mi.ir.l == 0 for mi in irreps_out
        )

    def _nbr_kernel_supported(self, edges: EdgeData) -> bool:
        """Fused sparse-conv kernel (ops/pallas/nbr_conv.py): l<=1 separable
        shapes only, forward-only (callers gate on `training` via the
        `nbr_kernel` field), single-shard (no atom halo)."""
        if not (
            self.nbr_kernel
            and self.tensor_product == "uvu"
            and self.atom_axis is None
            and not self.is_initializing()
            and edges.sh_nbr is not None
            and edges.attr_nbr is not None
        ):
            return False
        sv = self._sv_shape()
        if sv is None:
            return False
        from jamun_tpu.ops.pallas.nbr_conv import supports_nbr_conv

        shapes_ok = self.radial_hidden is None or list(self.radial_hidden) == [self.edge_attr_dim]
        return shapes_ok and supports_nbr_conv(
            sv[0],
            sv[1],
            Irreps(self.irreps_sh).dim,
            self.edge_attr_dim,
            self.edge_attr_dim,
            edges.nbr_idx.shape[-1],
        )

    def _fast_uvu_supported(self) -> bool:
        irreps_sh = Irreps(self.irreps_sh)
        return (
            self.fast_path
            and self.tensor_product == "uvu"
            and self._sv_shape() is not None
            and [mi.ir.l for mi in irreps_sh] == [0, 1]
            and irreps_sh.num_irreps == 2
        )

    def __call__(self, node_attr: jnp.ndarray, edges: EdgeData) -> jnp.ndarray:
        """node_attr: [G, N, irreps_in.dim] -> [G, N, irreps_out.dim]."""
        G, N, _ = node_attr.shape
        cdt = self.dtype or node_attr.dtype
        out_dtype = node_attr.dtype
        node_attr = node_attr.astype(cdt)
        # atom-sharded halo: src features are the full gathered molecule,
        # dst rows (and therefore outputs) stay local to this shard
        if self.atom_axis is not None:
            src_attr_full = jax.lax.all_gather(node_attr, self.atom_axis, axis=1, tiled=True)
        else:
            src_attr_full = node_attr

        if edges.nbr_idx is not None:
            # --- sparse capped-neighbor path (ops/neighbors.py): O(N*K)
            # message work; the right algorithm once the dense panel's fill
            # factor collapses (large molecules, train_idrome regime) ---
            if self._nbr_kernel_supported(edges):
                # fused VMEM kernel: radial MLP + one-hot feature gather +
                # messages + K-sum in one program (the XLA row-gather alone
                # measured 1.3-1.5 ms at N=1024 — BENCH_NOTES round 5a)
                from jamun_tpu.ops.pallas.nbr_conv import nbr_uvu_conv

                S, V = self._sv_shape()
                rp = self.radial_nn.variables["params"]
                w1 = rp["Dense_0"]["kernel"]
                b1 = rp["Dense_0"]["bias"]
                if edges.attr_nbr.shape[-1] != w1.shape[0]:
                    # radial-only attr from the edge-features kernel
                    # (nbr_edge_features): fold the constant bondedness-0
                    # embedding block into the bias, full precision (the
                    # dense kernels' trick — see fused_conv.py)
                    nb = w1.shape[0] - edges.attr_nbr.shape[-1]
                    b1 = b1 + jnp.einsum(
                        "i,ij->j",
                        edges.bond0_embed.astype(jnp.float32),
                        w1[:nb].astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    w1 = w1[nb:]
                out, deg = nbr_uvu_conv(
                    src_attr_full,
                    edges.sh_nbr,
                    edges.attr_nbr,
                    edges.nbr_idx,
                    edges.nbr_mask,
                    w1,
                    b1,
                    rp["Dense_1"]["kernel"],
                    rp["Dense_1"]["bias"],
                    S=S,
                    V=V,
                    interpret=jax.default_backend() not in ("tpu", "axon"),
                    compute_dtype=self.dtype,
                )
            elif self._fast_uvu_supported():
                from jamun_tpu.ops.fast_uvu import fast_uvu_messages_nbr

                if edges.attr_nbr.shape[-1] != self.edge_attr_dim:
                    raise RuntimeError(
                        "radial-only neighbor features (nbr_edge_features) "
                        "require the nbr kernel path — dispatch mismatch"
                    )
                S, V = self._sv_shape()
                w_nbr = self.radial_nn(edges.attr_nbr.astype(cdt))  # [G, N, K, wn]
                out, deg = fast_uvu_messages_nbr(
                    src_attr_full, edges.sh_nbr, w_nbr, edges.nbr_idx, edges.nbr_mask, S=S, V=V,
                )
            else:
                from jamun_tpu.ops.neighbors import gather_neighbors

                w_nbr = self.radial_nn(edges.attr_nbr.astype(cdt))  # [G, N, K, wn]
                src_nbr = gather_neighbors(src_attr_full, edges.nbr_idx).astype(cdt)
                msg = self.tp(src_nbr, edges.sh_nbr.astype(cdt), w_nbr)  # [G, N, K, out]
                out = jnp.einsum(
                    "gnkd,gnk->gnd", msg, edges.nbr_mask.astype(cdt),
                    preferred_element_type=out_dtype,
                )
                deg = jnp.sum(edges.nbr_mask, axis=-1)
            out = out.astype(out_dtype)
            deg = deg.astype(jnp.float32)
        elif self._pallas_supported(node_attr, edges):
            S, V = self._sv_shape()
            rp = self.radial_nn.variables["params"]
            n_radial = (self.edge_attr_dim + 1) // 2
            interpret = jax.default_backend() not in ("tpu", "axon")  # CPU: interpreter
            if self.pallas_variant == "packed" and self._fused_layer_supported(edges):
                # the COMPLETE layer (dense + bonds + mean-agg + post-linear)
                # fused in one kernel; edge features computed once per forward
                from jamun_tpu.ops.pallas.packed_conv import (
                    packed_edge_features,
                    packed_separable_conv_layer,
                )

                if edges.ef_packed is not None:
                    ef, bf, ebsT, ebd = (
                        edges.ef_packed, edges.bf_packed, edges.ebsT_packed, edges.ebd_packed
                    )
                else:
                    ef, bf, ebsT, ebd = packed_edge_features(
                        edges.pos,
                        edges.node_mask,
                        edges.bond_src,
                        edges.bond_dst,
                        edges.bond_mask > 0,
                        edges.radial_cutoff,
                        n_radial=n_radial,
                        interpret=interpret,
                        compute_dtype=self.dtype,
                    )
                out_blocks = tuple(
                    (mi.mul, mi.ir.l) for mi in Irreps(self.irreps_out)
                )
                out = packed_separable_conv_layer(
                    node_attr,
                    ef, bf, ebsT, ebd,
                    rp["Dense_0"]["kernel"],
                    rp["Dense_0"]["bias"],
                    rp["Dense_1"]["kernel"],
                    rp["Dense_1"]["bias"],
                    edges.bond0_embed,
                    edges.bond1_embed,
                    dict(self._post_linear.variables["params"]),
                    S=S,
                    V=V,
                    out_blocks=out_blocks,
                    n_radial=n_radial,
                    interpret=interpret,
                    compute_dtype=self.dtype,
                )
                return out.astype(out_dtype)

            kernel_kwargs = dict(
                S=S,
                V=V,
                n_radial=n_radial,
                interpret=interpret,
                compute_dtype=self.dtype,
            )
            if self.pallas_variant == "packed":
                from jamun_tpu.ops.pallas.packed_conv import packed_uvu_conv_dense as kernel_fn
            else:
                from jamun_tpu.ops.pallas.fused_conv import fused_uvu_conv_dense as kernel_fn

                kernel_kwargs["graphs_per_program"] = self.pallas_graphs_per_program
            out, deg = kernel_fn(
                edges.pos,
                edges.node_mask,
                node_attr,
                rp["Dense_0"]["kernel"],
                rp["Dense_0"]["bias"],
                rp["Dense_1"]["kernel"],
                rp["Dense_1"]["bias"],
                edges.bond0_embed,
                edges.radial_cutoff,
                **kernel_kwargs,
            )
            out = out.astype(out_dtype)
        elif self._fast_uvu_supported():
            from jamun_tpu.ops.fast_uvu import fast_uvu_messages_dense

            S, V = self._sv_shape()
            w_dense = self.radial_nn(edges.attr_dense.astype(cdt))  # [G, N, N_src, weight_numel]
            out, deg = fast_uvu_messages_dense(
                src_attr_full, edges.sh_dense, w_dense, edges.adj, S=S, V=V,
            )
            out = out.astype(out_dtype)
            deg = deg.astype(jnp.float32)
        else:
            # --- dense radial edges (generic XLA path) ---
            w_dense = self.radial_nn(edges.attr_dense.astype(cdt))  # [G, N, N_src, weight_numel]
            N_src = src_attr_full.shape[1]
            src_attr = jnp.broadcast_to(
                src_attr_full[:, None, :, :], (G, N, N_src, src_attr_full.shape[-1])
            )
            msg = self.tp(src_attr, edges.sh_dense.astype(cdt), w_dense)  # [G, dst, src, out]
            out = jnp.einsum(
                "gijd,gij->gid", msg, edges.adj.astype(cdt), preferred_element_type=out_dtype
            )
            deg = jnp.sum(edges.adj, axis=-1)  # [G, N] (f32)

        # --- bonded edges (small static list) ---
        w_bond = self.radial_nn(edges.attr_bond.astype(cdt))  # [G, B, weight_numel]
        src_b = jnp.take_along_axis(src_attr_full, edges.bond_src[..., None], axis=1)  # [G, B, D]
        msg_b = self.tp(src_b, edges.sh_bond.astype(cdt), w_bond).astype(out_dtype)
        msg_b = msg_b * edges.bond_mask[..., None]
        out = out + _segment_sum_per_graph(msg_b, edges.bond_dst, N)
        deg = deg + _segment_sum_per_graph(edges.bond_mask[..., None], edges.bond_dst, N)[..., 0]

        out = out / jnp.maximum(deg, 1.0)[..., None]
        if self._post_linear is not None:
            out = self._post_linear(out)
        return out


class SeparableConv(Conv):
    """Conv with the depthwise+pointwise factorized tensor product
    (`/root/reference/src/jamun/e3tools/nn/_conv.py:122-135`). ~100x fewer
    radial-MLP output features than the fully-connected product."""

    tensor_product: str = "uvu"


class ExperimentalConv(Conv):
    """Conv with the full-TP + externally-weighted-linear product
    (`/root/reference/src/jamun/e3tools/nn/_conv.py:138-144`)."""

    tensor_product: str = "experimental"


class ConvBlock(nn.Module):
    """LinearSelfInteraction(Gated(Conv)) — reference `nn/_conv.py:147-223`."""

    irreps_in: Union[str, Irreps]
    irreps_out: Union[str, Irreps]
    irreps_sh: Union[str, Irreps]
    edge_attr_dim: int
    tensor_product: str = "uvw"
    dtype: Any = None
    use_pallas: bool = False
    pallas_variant: str = "packed"
    nbr_kernel: bool = False
    atom_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        node_attr: jnp.ndarray,
        edges: EdgeData,
        transposed_in: bool = False,
        transposed_out: bool = False,
    ) -> jnp.ndarray:
        """`transposed_in`: node_attr is the kernel-native [G, Sp + 3*Vp, N]
        layout; `transposed_out`: the raw [G, Scp + 3*Vgp, N] kernel output is
        returned — zero-transpose chaining of consecutive blocks. Only valid
        when the fused-block kernel path applies (the caller must guard)."""
        irreps_in = Irreps(self.irreps_in)
        irreps_out = Irreps(self.irreps_out)
        gate = Gate(irreps_out)
        conv = Conv(
            irreps_in=irreps_in,
            irreps_out=gate.irreps_in,
            irreps_sh=self.irreps_sh,
            edge_attr_dim=self.edge_attr_dim,
            tensor_product=self.tensor_product,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pallas_variant=self.pallas_variant,
            nbr_kernel=self.nbr_kernel,
            atom_axis=self.atom_axis,
        )

        def standard(x):
            # LinearSelfInteraction (`nn/_interaction.py:5`): f(x) passed
            # through a linear "self interaction" + a linear skip of the input
            skip = IrrepsLinear(irreps_in, gate.irreps_out)(x)
            y = conv(x, edges)
            y = gate(y)
            y = IrrepsLinear(gate.irreps_out, gate.irreps_out)(y)
            return y + skip

        if transposed_in or transposed_out:
            n_atoms = node_attr.shape[-1] if transposed_in else node_attr.shape[1]
            if self._fused_block_supported(conv, gate, node_attr, edges, n_atoms=n_atoms):
                return self._fused_block(
                    conv, gate, node_attr, edges,
                    transposed_in=transposed_in, transposed_out=transposed_out,
                )
            # graceful degradation: a caller-side support check that drifts
            # from _fused_block_supported must not turn into a forward crash —
            # un/re-transpose around the standard path (two layout copies,
            # same math, same params; the chained caller keeps working).
            from jamun_tpu.ops.pallas.packed_conv import (
                pack_features_transposed,
                unpack_features_transposed,
            )

            S_in = irreps_in[0].mul
            V_in = irreps_in[1].mul if len(list(irreps_in)) > 1 else 0
            x = node_attr
            if transposed_in:
                x = unpack_features_transposed(x, S_in, V_in)
            out = standard(x)
            if transposed_out:
                gi = list(gate.irreps_out)
                out = pack_features_transposed(
                    out, gi[0].mul, gi[1].mul if len(gi) > 1 else 0, jnp.float32
                )
            return out

        if self._fused_block_supported(conv, gate, node_attr, edges):
            return self._fused_block(conv, gate, node_attr, edges)

        return standard(node_attr)

    def _fused_block_supported(
        self, conv: Conv, gate: Gate, node_attr, edges, n_atoms: int = None
    ) -> bool:
        """Whole-ConvBlock kernel: additionally requires the canonical gate
        shape [(Sc,0e),(Gt,0e),(Vg,1e)] with Gt == Vg and default gate acts."""
        if self.is_initializing():
            return False  # init runs the normal path so every param is created
        gin = list(Irreps(gate.irreps_in))
        canonical = (
            len(gin) == 3
            and gin[0].ir.l == 0 and gin[0].ir.p == 1
            and gin[1].ir.l == 0 and gin[1].ir.p == 1
            and gin[2].ir.l == 1 and gin[2].ir.p == 1
            and gin[1].mul == gin[2].mul
        )
        return (
            canonical
            and self.pallas_variant == "packed"
            and conv._pallas_supported(node_attr, edges, n_atoms=n_atoms, tiled=True)
            and conv._fused_layer_supported(edges)
        )

    def _fused_block(
        self, conv: Conv, gate: Gate, node_attr, edges,
        transposed_in: bool = False, transposed_out: bool = False,
    ) -> jnp.ndarray:
        """Run the whole block (conv + gate + linear + linear skip) in ONE
        fused kernel, reading the (init-created) child params by name.

        Generation dispatch (measured on v5e, BENCH_NOTES round 3): N <= 128
        runs the gen-3 kernel (per-forward edge-feature precompute — the HBM
        read pipelines for free and beats in-kernel recompute); N > 128 runs
        the gen-4 dst-block-tiled kernel (geometry in-kernel; no N^2 HBM
        array, no VMEM ceiling)."""
        from jamun_tpu.ops.pallas import packed_conv as pk

        cdt = self.dtype or node_attr.dtype
        out_dtype = node_attr.dtype
        S, V = conv._sv_shape()
        n_radial = (self.edge_attr_dim + 1) // 2
        interpret = jax.default_backend() not in ("tpu", "axon")
        cp = self.get_variable("params", "Conv_0")
        rp = cp["radial_nn"]
        n_atoms = node_attr.shape[-1] if transposed_in else node_attr.shape[1]
        weights = (
            rp["Dense_0"]["kernel"],
            rp["Dense_0"]["bias"],
            rp["Dense_1"]["kernel"],
            rp["Dense_1"]["bias"],
            edges.bond0_embed,
            edges.bond1_embed,
            dict(cp["_post_linear"]),
            dict(self.get_variable("params", "IrrepsLinear_1")),
            dict(self.get_variable("params", "IrrepsLinear_0")),
        )
        out_blocks = tuple((mi.mul, mi.ir.l) for mi in Irreps(gate.irreps_in))
        mk_kwargs = (
            S, V, out_blocks, n_radial, interpret, self.dtype,
        )
        tkw = dict(transposed_in=transposed_in, transposed_out=transposed_out)

        if n_atoms <= 128:
            if edges.ef_packed is not None:
                ef, bf, ebsT, ebd = (
                    edges.ef_packed, edges.bf_packed, edges.ebsT_packed, edges.ebd_packed
                )
            else:
                ef, bf, ebsT, ebd = pk.packed_edge_features(
                    edges.pos,
                    edges.node_mask,
                    edges.bond_src,
                    edges.bond_dst,
                    edges.bond_mask > 0,
                    edges.radial_cutoff,
                    n_radial=n_radial,
                    interpret=interpret,
                    compute_dtype=self.dtype,
                )
            fn = pk.make_trainable_conv_block(
                *mk_kwargs, **tkw,
                use_residuals=pk.bwd_residuals_enabled(n_atoms),
            )
            out = fn(node_attr.astype(cdt), ef, bf, ebsT, ebd, *weights)
        else:
            if edges.posm_packed is not None:
                posm, bf, ebsT, ebd = (
                    edges.posm_packed, edges.bf_packed, edges.ebsT_packed, edges.ebd_packed
                )
            else:
                posm, bf, ebsT, ebd = pk.packed_geometry_inputs(
                    edges.pos,
                    edges.node_mask,
                    edges.bond_src,
                    edges.bond_dst,
                    edges.bond_mask > 0,
                    edges.radial_cutoff,
                    n_radial=n_radial,
                    compute_dtype=self.dtype,
                )
            fn = pk.make_trainable_conv_block_v2(*mk_kwargs, **tkw)
            out = fn(
                node_attr.astype(cdt), posm, bf, ebsT, ebd, *weights,
                edges.radial_cutoff,
            )
        return out.astype(out_dtype)
