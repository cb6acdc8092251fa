"""optix_ray_tracer_tpu — a TPU-native renderer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
``3169651074/nvidia-optix-ray-tracer`` (an OptiX 9 real-time renderer for
time-series DEM/VTK particle simulation data).  The architecture is
TPU-first, not a port:

* OptiX GAS/IAS hardware BVHs      -> on-device LBVH (Morton + Karras) built
                                      with XLA sort, traversed by a stackless
                                      wavefront kernel (``ops/``).
* recursive megakernel shaders     -> an iterative wavefront integrator
                                      (``render/wavefront.py``) with
                                      ``lax.scan`` over bounce depth.
* cuRAND mutable per-pixel states  -> stateless counter-based RNG keyed by
                                      (pixel, sample, bounce).
* SBT + program groups             -> material/geometry index arrays and
                                      vectorized masked shading.
* SDL/GL/VK/D3D presentation       -> headless HBM-resident film + PNG/PPM
                                      output (``render/film.py``), optional
                                      local viewer.
* single-GPU                       -> multi-chip via ``jax.sharding.Mesh``
                                      (``parallel/``).

Scene/config compatibility: the JSON config schema, ``.vtk.series``
manifests, VTK ASCII polydata, and STL shape libraries of the reference are
all supported by ``io/``.
"""

__version__ = "0.1.0"

import jax as _jax

# Ray tracing needs true fp32 arithmetic: TPU matmul/einsum units default to
# bf16 multiplication, which loses intersection precision (observed: missed
# hits in Woop-space leaf tests).  Geometry math is tiny compared to
# traversal, so force full precision globally.
_jax.config.update("jax_default_matmul_precision", "highest")

from optix_ray_tracer_tpu.utils import vecmath, transforms, color, colorramp  # noqa: F401,E402
