from wc_path_tracer_tpu.cli import main

main()
