"""graspnerf_tpu — a TPU-native generalizable-NeRF grasp detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of PKU-EPIC/GraspNeRF
(reference: /root/reference): 6 sparse RGB views -> multiview 2D CNN features ->
per-ray epipolar aggregation -> NeuS-style SDF volume rendering -> dense 40^3 TSDF
volume -> 3D-CNN grasp head (quality / rotation / width), trained end-to-end and
evaluated by closed-loop clutter removal.

Subpackages
-----------
ops       pure-function compute primitives (geometry, sampling, interpolation,
          compositing, TSDF, image morphology) + Pallas TPU kernels
models    flax.linen network modules (ResUNet encoder, dist decoder, IBRNet-style
          aggregator, NeuS heads, 3D-CNN grasp head, full renderer)
train     losses, metrics, LR schedules, the pjit training loop, checkpointing
data      scene database contract, dataset sampling pipeline, synthetic data
parallel  device-mesh construction and sharding rules (data x space axes)
detect    grasp post-processing (jittable NMS) and the planner API
sim       host-side simulation/eval harness (transforms, TSDF fusion, clutter
          removal experiment loop) — physics backend optional
"""

__version__ = "0.1.0"

from . import ops  # noqa: E402,F401
from . import models  # noqa: E402,F401
from . import data  # noqa: E402,F401
from . import parallel  # noqa: E402,F401
from . import train  # noqa: E402,F401
from . import detect  # noqa: E402,F401
from . import sim  # noqa: E402,F401
