from .builtin import (cornell_box, stanford_bunny, cornell_box_with_bunny,
                      triangle_ground, load_reference_envmap, bunny_mesh,
                      textured_demo)

__all__ = ["cornell_box", "stanford_bunny", "cornell_box_with_bunny",
           "triangle_ground", "load_reference_envmap", "bunny_mesh",
           "textured_demo"]
