"""soc_real_time_renderer_tpu — a TPU-native real-time deferred renderer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
reference Vulkan/Daxa renderer ``lukasino1214/soc_real_time_renderer``
(G-buffer deferred shading, shadow mapping, terrain, SSAO, SSR, clouds +
atmosphere, bloom, TAA, histogram auto-exposure, AgX tone mapping),
designed TPU-first: the whole frame is one pure jitted function over a
pytree scene, rasterization is a tiled binning kernel, and all
screen-space passes are fused XLA/Pallas image ops.

Layout:
  config.py   static RenderConfig + dynamic ShaderGlobals pytrees
  camera.py   perspective/fly cameras + TAA jitter
  scene/      entity-component scene model (ECS analog)
  models/     asset pipeline: glTF meshes, textures/atlas, terrain
  ops/        all render kernels (raster, lighting, post stack)
  graph/      frame-graph assembly: render_frame()
  parallel/   multi-chip meshes and shardings
  utils/      math, image IO, timing
"""

__version__ = "0.1.0"

from .config import RenderConfig, ShaderGlobals, SunInfo, LightArrays  # noqa: F401
from .camera import Camera3D, ControlledCamera3D, InputState  # noqa: F401
