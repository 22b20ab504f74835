from . import debugdraw
from .frame import (FrameConstants, highlight, pick, render_frame,
                    render_frame_jit, render_pathtrace, render_pathtrace_jit)
