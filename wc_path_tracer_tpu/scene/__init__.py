from wc_path_tracer_tpu.scene.types import (  # noqa: F401
    MATERIAL_METAL,
    MATERIAL_DIELECTRIC,
    MATERIAL_LAMBERTIAN,
    MATERIAL_GGX,
    Materials,
    Spheres,
    MeshBank,
    Scene,
)
from wc_path_tracer_tpu.scene.camera import Camera, camera_matrices  # noqa: F401
