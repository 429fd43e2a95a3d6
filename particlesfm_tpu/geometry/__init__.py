from . import rotations, se3, cameras, epipolar, triangulation, alignment
