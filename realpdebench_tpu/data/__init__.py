from realpdebench_tpu.data.splits import SplitSpec, compute_split_counts
from realpdebench_tpu.data.normalizer import (
    GaussianNormalizer,
    IdentityNormalizer,
    RangeNormalizer,
    build_normalizer,
)
from realpdebench_tpu.data.fluid import (
    Cylinder,
    ControlledCylinder,
    FluidDataset,
    FSI,
    Foil,
)
from realpdebench_tpu.data.loader import DataLoader, cycle_loader
