from .lbvh import LBVH, build, refit, morton3d
from .traverse import (Hit, HitIds, find_closest_bruteforce,
                       find_closest_bvh, recompute_hit)
