from wc_path_tracer_tpu.utils.config import RenderConfig  # noqa: F401
