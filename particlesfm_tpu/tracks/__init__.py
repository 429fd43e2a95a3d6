from .optimize import optimize_locations, path_consistency_residuals
from .engine import run_tracker, TrackerConfig, TrackerOutput
from .store import TrackArrays, assemble_tracks, sample_inside_window
