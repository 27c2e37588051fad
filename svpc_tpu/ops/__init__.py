from svpc_tpu.ops.losses import (  # noqa: F401
    label_smoothing_kl, bce_sum, asymmetric_loss_sum,
)
from svpc_tpu.ops.gumbel import gumbel_softmax_st  # noqa: F401
