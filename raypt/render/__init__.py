from .envmap import rotate_y_pi, sample_env
from .integrator import (accumulate, camera_rays_for_ids, make_finder,
                         pixel_id_grid, render_aovs, render_frame,
                         render_sample, trace_paths)
from .tonemap import to_display, to_u8
