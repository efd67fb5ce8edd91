from sd_tpu.losses.gan import (
    GanLossConfig,
    adopt_weight,
    calculate_adaptive_weight,
    hinge_d_loss,
    vanilla_d_loss,
)
