from .stages import (
    flow_stage,
    tracking_stage,
    depth_stage,
    motionseg_stage,
    sfm_stage,
)
from .run import run_pipeline, build_arg_parser
