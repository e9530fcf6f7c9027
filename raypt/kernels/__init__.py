from .dense_pallas import pallas_closest_dense, prepare_woop_mats
from .intersect import make_pallas_finder
