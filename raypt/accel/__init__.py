from .lbvh import LBVH, build, refit, morton3d
from .host_bvh import build_sah, host_tree_to_lbvh
from .packed import PackedLBVH, pack, traverse_wavefront
from .wide import WideBVH, collapse, traverse_wide
from .dense import WoopTris, build_woop, closest_dense
from .ctree import ClusterTree, build_cluster_tree, build_onehot
from .traverse import (Hit, HitIds, find_closest_bruteforce,
                       find_closest_bvh, find_closest_dense,
                       find_closest_onehot, find_closest_packed,
                       find_closest_wide, recompute_hit)
