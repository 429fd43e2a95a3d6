from .mapper import Reconstruction, run_global_mapper
from .incremental import run_incremental_mapper
from .correspondences import (
    ObsTensors,
    PairTensors,
    build_observations,
    build_pair_tensors,
    static_observation_mask,
)
from .stats import compute_model_stats, format_model_stats
from .export import to_colmap_model, write_colmap_model, write_converted_outputs
