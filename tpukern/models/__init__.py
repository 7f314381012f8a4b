from tpukern.models.transformer import (
    Config,
    init_params,
    forward,
    loss_fn,
    make_train_step,
    make_sharded_train_step,
    param_specs,
)

__all__ = [
    "Config", "init_params", "forward", "loss_fn", "make_train_step",
    "make_sharded_train_step", "param_specs",
]
