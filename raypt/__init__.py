"""raypt — a TPU-native differentiable Monte-Carlo path tracer in JAX.

Brand-new framework with the capabilities of the reference CUDA path
tracer (Division/CUDA-RayTracing), redesigned TPU-first:
  raypt.core    scene pytrees, math, camera      (ref: Scene/GPUScene/Math)
  raypt.rng     counter-based threefry sampling  (ref: Random.{h,cu}/curand)
  raypt.accel   LBVH build + stackless traversal (ref: BVH.{h,cpp} + BVHRayHit)
  raypt.render  path-tracing integrator, envmap, tonemap (ref: main_raytracing.cu)
  raypt.kernels Pallas TPU kernels for the hot intersect path
  raypt.diff    losses + inverse rendering (new capability per BASELINE)
  raypt.dist    mesh sharding / multi-host scaling (new capability)
  raypt.io      OBJ / DDS / HDR / PNG, checkpoints (ref: utils/, utils/image/)
  raypt.scenes  built-in Cornell box & Stanford bunny (ref: RayTracing.cpp:33-203)
  raypt.app     CLI, config, metrics
"""

__version__ = "0.1.0"

from .core.types import (CameraRays, EnvMap, Materials, MeshArrays,
                         RenderConfig, Scene, Spheres)
from .core.scene import SceneBuilder, MaterialDef, DirtyFlag
from .core.camera import Camera

__all__ = [
    "Camera", "CameraRays", "DirtyFlag", "EnvMap", "MaterialDef",
    "Materials", "MeshArrays", "RenderConfig", "Scene", "SceneBuilder",
    "Spheres", "__version__",
]
