"""particlesfm_tpu — TPU-native structure-from-motion for dynamic-scene videos.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of ParticleSfM
(reference pipeline: images -> optical flow -> point trajectories -> motion
segmentation -> global SfM; see /root/reference/run_particlesfm.py:17-19).
"""

import jax as _jax

# Geometry/solver correctness requires true-f32 matmuls; the TPU default would
# compute f32 contractions at bf16 precision. Model code opts into bf16 speed
# explicitly by casting activations, which this setting does not affect.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
