"""surfacenet-tpu: a TPU-native multi-view-stereo framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SurfaceNet
(Ji et al., ICCV 2017; reference repo mjiUST/SurfaceNet): colored-voxel-cube
construction by perspective warping, a fully-convolutional 3D CNN surface
regressor, learned view-pair selection and weighted fusion, ray-pooling
thinning, and a batched sharded sweep over the scene volume with sparse
merge to a point cloud.  See SURVEY.md for the blueprint and provenance.
"""

__version__ = "0.1.0"

from surfacenet_tpu.config import Config, baseline_config  # noqa: F401
