from jamun_tpu.ops.conv import Conv, ConvBlock, SeparableConv
from jamun_tpu.ops.gate import Gate
from jamun_tpu.ops.geometry import kabsch_align, mean_center
from jamun_tpu.ops.graph import EdgeData, GraphBatch, dense_edge_data
from jamun_tpu.ops.irreps import Irrep, Irreps, pack_irreps, unpack_irreps
from jamun_tpu.ops.layer_norm import equivariant_layer_norm
from jamun_tpu.ops.linear import IrrepsLinear
from jamun_tpu.ops.mlp import EquivariantMLP, EquivariantMLPBlock, ScalarMLP
from jamun_tpu.ops.radial import soft_one_hot_linspace
from jamun_tpu.ops.sh import spherical_harmonics
from jamun_tpu.ops.tensor_product import (
    WeightedTensorProduct,
    depthwise_tp,
    fully_connected_tp,
    scale_irreps,
)
from jamun_tpu.ops.attention import Attention, MultiheadAttention, TransformerBlock, split_irreps
from jamun_tpu.ops.experimental_tp import ExperimentalTensorProduct, external_linear, full_tensor_product
from jamun_tpu.ops.extract import ExtractIrreps, ScaleIrreps, extract_irreps
