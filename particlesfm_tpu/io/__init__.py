from . import flo, colmap_model, colmap_db, trackio, images
