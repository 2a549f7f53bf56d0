"""raytracingrust_tpu — a TPU-native differentiable path tracer.

Brand-new JAX/XLA/Pallas framework with the full capability surface of the
reference Rust CPU tracer (LevKruglyak/RayTracingRust), re-designed TPU-first:
SoA scene pytrees, intersection-as-matmul on the MXU, a flat skip-link BVH
with stackless lockstep traversal, branchless material shading, counter-based
reproducible RNG, ray-sharded multi-chip rendering, and detached-sampling
gradients for inverse rendering.
"""

__version__ = "0.1.0"

from .models.backgrounds import Background
from .models.camera import Camera
from .models.materials import (
    Dielectric,
    Emission,
    Isotropic,
    Lambertian,
    Metal,
    MixMaterial,
)
from .models.mesh import Mesh
from .models.scene import (
    MODE_CLAY,
    MODE_FULL,
    MODE_NORMAL,
    MODE_RANDOM,
    RenderSettings,
    Scene,
    SceneBuilder,
    load_scene,
)
from .render.render import render, render_linear

__all__ = [
    "Background", "Camera", "Dielectric", "Emission", "Isotropic",
    "Lambertian", "Metal", "MixMaterial", "Mesh", "RenderSettings", "Scene",
    "SceneBuilder", "load_scene", "render", "render_linear",
    "MODE_FULL", "MODE_CLAY", "MODE_NORMAL", "MODE_RANDOM",
]
