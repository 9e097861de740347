from indm_tpu.metrics.fid import (
    frechet_distance,
    inception_score,
    kernel_distance,
    compute_statistics,
)
