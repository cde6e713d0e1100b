"""Parallelism layer: meshes, sharding rules, multi-host init.

All cross-device communication in this framework is XLA-GSPMD collectives
induced by ``jit`` + ``NamedSharding`` over these meshes (the TPU-native
equivalent of the reference's pjit setup, reference trainer.py:160-239,
gaussian_diffusion.py:279-301), riding ICI within a slice and DCN across
slices once ``initialize_distributed`` has run.
"""

from video_diffusion_nnx_tpu.parallel.mesh import (
    data_model_mesh,
    data_parallel_mesh,
    initialize_distributed,
    make_mesh,
)
from video_diffusion_nnx_tpu.parallel.sequence import (
    sequence_parallel_temporal_attention,
)
from video_diffusion_nnx_tpu.parallel.sharding import (
    mirror_partition_spec,
    named_shardings,
    optimizer_partition_specs,
    param_partition_spec,
    params_partition_specs,
    path_entry_to_str,
    path_to_names,
)

__all__ = [
    "data_model_mesh",
    "data_parallel_mesh",
    "initialize_distributed",
    "make_mesh",
    "mirror_partition_spec",
    "named_shardings",
    "optimizer_partition_specs",
    "param_partition_spec",
    "params_partition_specs",
    "path_entry_to_str",
    "path_to_names",
    "sequence_parallel_temporal_attention",
]
