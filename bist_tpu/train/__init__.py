from bist_tpu.train.losses import label_smoothing_kl, compute_losses
from bist_tpu.train.schedule import noam_schedule, make_optimizer
