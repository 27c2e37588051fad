from svpc_tpu.train.optim import (  # noqa: F401
    bert_adam, make_optimizer, ema_update, lr_schedule_fn,
)
from svpc_tpu.train.state import TrainState  # noqa: F401
