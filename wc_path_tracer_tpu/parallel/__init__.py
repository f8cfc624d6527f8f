from wc_path_tracer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate_scene,
    initialize_distributed,
)
from wc_path_tracer_tpu.parallel.render import (  # noqa: F401
    sharded_render_frame,
    sharded_scene_loss_grad,
    make_train_step,
)
