from v2ap_tpu.training.trainer import (  # noqa: F401
    Trainer, EMA, make_train_step, make_eval_step, make_tx, make_lr_schedule,
)
