"""`python -m realpdebench_tpu.train --config ... --train_data_type ...`

CLI-compatible with the reference trainer (`realpdebench/train.py`)."""

import datetime
import logging
import os

from realpdebench_tpu.config import make_arg_parser, merge_config
from realpdebench_tpu.core.mesh import maybe_initialize_distributed
from realpdebench_tpu.train.loop import run_training
from realpdebench_tpu.utils.misc import set_seed, setup_logging


def main():
    parser = make_arg_parser("RealPDEBench-TPU training")
    args = parser.parse_args()
    cfg = merge_config(args)
    maybe_initialize_distributed()

    set_seed(int(cfg.get("seed", 0)))

    current_time = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    exp_path = os.path.join(
        cfg.get("results_path", "./results/"),
        cfg.model_name,
        f"{cfg.exp_name}_{cfg.train_data_type}_{bool(cfg.get('is_finetune'))}",
        current_time,
    )
    os.makedirs(exp_path, exist_ok=True)

    writer = setup_logging(exp_path, bool(cfg.get("is_use_tb")))
    if writer is not None:
        for key, value in cfg.to_dict().items():
            writer.add_text(key, str(value), 0)
    logging.info(f"args: {cfg.to_dict()}")

    run_training(cfg, exp_path, writer=writer)
    logging.info(f"Results saved at {exp_path}")
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
