from .sampler import (bounce_uniforms, random_point_on_sphere,
                      refraction_uniform, sample_jitter, frame_key,
                      sample_key)

__all__ = ["bounce_uniforms", "random_point_on_sphere",
           "refraction_uniform", "sample_jitter", "frame_key",
           "sample_key"]
