from realpdebench_tpu.core.mesh import (
    MeshContext,
    make_mesh_context,
    parse_mesh_shape,
)
from realpdebench_tpu.core.prefetch import prefetch_to_device
