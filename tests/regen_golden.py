"""Regenerate golden images (run on CPU only; see test_golden.py)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]

import numpy as np  # noqa: E402
import jax  # noqa: E402

from raypt.core.types import RenderConfig  # noqa: E402
from raypt.render import render_frame  # noqa: E402
from raypt.scenes import cornell_box, triangle_ground  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def main():
    b = triangle_ground()
    b.camera.viewport_width = b.camera.viewport_height = 32
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=2,
                       num_bounces=3, backend="bruteforce")
    img = np.asarray(render_frame(b.freeze(), cfg, jax.random.key(42)))
    np.save(os.path.join(GOLDEN, "triangle_32.npy"), img)

    b = cornell_box()
    b.camera.viewport_width = b.camera.viewport_height = 24
    cfg = RenderConfig(width=24, height=24, samples_per_pixel=2,
                       num_bounces=4, backend="dense")
    img = np.asarray(render_frame(b.freeze(), cfg, jax.random.key(7)))
    np.save(os.path.join(GOLDEN, "cornell_24.npy"), img)
    print("golden images regenerated")


if __name__ == "__main__":
    main()
