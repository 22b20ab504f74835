from .sharding import (band_projection, make_mesh, render_frame_sharded,
                       render_frame_sharded_jit)
