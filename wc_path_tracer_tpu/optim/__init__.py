from wc_path_tracer_tpu.optim.inverse import InverseRenderConfig, run_inverse_rendering  # noqa: F401
