"""SparseBEV-TPU: a TPU-native (JAX/XLA/Pallas/pjit) camera-only 3D detection
framework with the capabilities of MCG-NJU/SparseBEV.

Built from scratch for TPU: functional Flax modules, XLA-friendly static
shapes, Pallas kernels for the hot sampling op, and `jax.sharding.Mesh`
data parallelism instead of NCCL DDP.
"""

__version__ = "0.1.0"

from . import registry  # noqa: F401
from .registry import (  # noqa: F401
    Registry,
    BACKBONES,
    NECKS,
    HEADS,
    DETECTORS,
    TRANSFORMERS,
    DATASETS,
    PIPELINES,
    BBOX_ASSIGNERS,
    BBOX_CODERS,
    MATCH_COSTS,
    HOOKS,
    build,
)
from .config import Config  # noqa: F401
