from indm_tpu.ops.upfirdn2d import (
    upfirdn2d,
    upfirdn2d_native,
    upsample_2d,
    downsample_2d,
    upsample_conv_2d,
    conv_downsample_2d,
    naive_upsample_2d,
    naive_downsample_2d,
    setup_kernel,
)
from indm_tpu.ops.fused_act import fused_leaky_relu
from indm_tpu.ops.group_norm_pallas import (
    fused_group_norm_act,
    group_norm_act_reference,
)
