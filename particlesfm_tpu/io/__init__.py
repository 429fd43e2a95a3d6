from . import flo, colmap_model
