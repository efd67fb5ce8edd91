from sd_tpu.train.lr_schedules import (
    lambda_linear_schedule,
    lambda_warmup_cosine_schedule,
    lambda_warmup_cosine_schedule_v2,
)
from sd_tpu.train.gan import GanTrainState, make_kl_gan_train_step, make_vq_gan_train_step
