from sgqn_carla_tpu.render.raster import (  # noqa: F401
    Appearance,
    Camera,
    default_appearance,
    render,
    render_scene,
)
