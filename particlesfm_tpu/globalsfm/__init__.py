from .twoview import estimate_relative_poses, TwoViewResult
from .rotation_averaging import average_rotations
from .translation import refine_pairwise_translations, estimate_positions_lud
from .tracks3d import triangulate_tracks, filter_observations
from .ba import bundle_adjust, BAState, refine_shared_focal
