from realpdebench_tpu.train.train_step import (
    TrainState,
    build_optimizer,
    make_eval_step,
    make_train_step,
)
