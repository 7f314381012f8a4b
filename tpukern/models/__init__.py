from tpukern.models.moe import (init_moe_params, moe_block,
                                moe_param_specs, aux_load_balance_loss)
from tpukern.models.transformer import (
    Config,
    init_params,
    forward,
    loss_fn,
    make_train_step,
    make_sharded_grad_fn,
    make_sharded_train_step,
    param_specs,
    shard_opt_state,
    zero1_specs,
)

from tpukern.models.batcher import ContinuousBatcher, SpeculativeBatcher

__all__ = [
    "Config", "init_params", "forward", "loss_fn", "make_train_step",
    "make_sharded_grad_fn", "make_sharded_train_step", "param_specs",
    "shard_opt_state", "zero1_specs",
    "init_moe_params", "moe_block", "moe_param_specs",
    "aux_load_balance_loss", "ContinuousBatcher", "SpeculativeBatcher",
]
