from . import flo, colmap_model, trackio, images
