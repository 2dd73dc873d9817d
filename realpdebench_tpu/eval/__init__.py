from realpdebench_tpu.eval.metrics import (
    METRIC_NAMES,
    eval_metrics,
    eval_metrics_dict,
    kinetic_energy,
    mse_loss,
)
