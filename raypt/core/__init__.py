from . import math3d
from .camera import Camera
from .scene import DirtyFlag, MaterialDef, SceneBuilder
from .types import (CameraRays, EnvMap, Materials, MeshArrays, RenderConfig,
                    Scene, Spheres)
