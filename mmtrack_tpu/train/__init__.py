from mmtrack_tpu.train.actor import vipt_forward_and_loss, adjust_keep_rate
from mmtrack_tpu.train.optim import build_optimizer, prompt_only_mask
from mmtrack_tpu.train.train_step import TrainState, make_train_step
