from wc_path_tracer_tpu.models.obj import parse_obj  # noqa: F401
from wc_path_tracer_tpu.models import builtin  # noqa: F401
