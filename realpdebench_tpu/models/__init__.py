from realpdebench_tpu.models.base import ModelBundle
from realpdebench_tpu.models.registry import build_model
