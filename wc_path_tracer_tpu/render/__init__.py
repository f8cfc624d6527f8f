from wc_path_tracer_tpu.render.golden import render_frame, trace_rays, accumulate  # noqa: F401
from wc_path_tracer_tpu.render.renderer import Renderer  # noqa: F401
