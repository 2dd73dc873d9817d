from realpdebench_tpu.utils.misc import cycle, set_seed, setup_logging
