"""transform360_tpu — a TPU-native rebuild of facebook/transform360.

360° video re-projection (equirect ↔ cubemap and friends) as JAX/XLA
programs: plan-time vectorized warp-map generation, an MXU/VPU-friendly
adaptive prefilter, batched lane-vectorized remap, and ffmpeg-parity
configuration — batched and shardable over TPU meshes.
"""

from .config import (
    FaceType,
    FilterOptions,
    Interpolation,
    Layout,
    StereoFormat,
    TransformConfig,
    chroma_dims,
    negotiate_output_geometry,
    parse_options,
    resolve_stereo_formats,
)
from .api import Transform360, open_filter
from .plan import TransformPlan, build_plan, load_plan, save_plan
from .pipeline import device_put_plan, transform_batch, transform_frame

__version__ = "0.1.0"

__all__ = [
    "FaceType",
    "FilterOptions",
    "Interpolation",
    "Layout",
    "StereoFormat",
    "TransformConfig",
    "Transform360",
    "TransformPlan",
    "build_plan",
    "chroma_dims",
    "device_put_plan",
    "load_plan",
    "negotiate_output_geometry",
    "open_filter",
    "parse_options",
    "resolve_stereo_formats",
    "save_plan",
    "transform_batch",
    "transform_frame",
    "__version__",
]
