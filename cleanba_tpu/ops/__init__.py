from cleanba_tpu.ops.gae import compute_gae
from cleanba_tpu.ops.losses import (
    ImpalaLossAux,
    PPOLossAux,
    impala_loss_from_outputs,
    ppo_loss_from_outputs,
)
from cleanba_tpu.ops.optim import (
    linear_schedule,
    make_impala_optimizer,
    make_ppo_optimizer,
    rmsprop_pytorch_style,
    scale_by_rms_pytorch_style,
)
from cleanba_tpu.ops.sampling import log_softmax_gather, sample_gumbel, softmax_entropy
from cleanba_tpu.ops.vtrace import (
    VTraceOutput,
    categorical_importance_ratios,
    vtrace_td_error_and_advantage,
)

__all__ = [
    "compute_gae",
    "ImpalaLossAux",
    "PPOLossAux",
    "impala_loss_from_outputs",
    "ppo_loss_from_outputs",
    "linear_schedule",
    "make_impala_optimizer",
    "make_ppo_optimizer",
    "rmsprop_pytorch_style",
    "scale_by_rms_pytorch_style",
    "log_softmax_gather",
    "sample_gumbel",
    "softmax_entropy",
    "VTraceOutput",
    "categorical_importance_ratios",
    "vtrace_td_error_and_advantage",
]
