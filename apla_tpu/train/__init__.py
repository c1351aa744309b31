from .schedules import LRScheduler, cosine_with_warmup_table
from .optim import build_optimizer, wd_mask
from .train_state import TrainState
