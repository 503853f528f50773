from jamun_tpu.ops.pallas.fused_conv import fused_uvu_conv_dense, supports_fused_conv
