from .optim import build_optimizer, cosine_warmup_schedule
from .train_state import TrainState, create_train_state
from .step import make_train_step, make_eval_step, build_loss
