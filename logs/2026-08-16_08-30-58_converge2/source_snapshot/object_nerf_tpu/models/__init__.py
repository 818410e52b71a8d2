from .embedding import freq_encode, freq_encode_channels
from .mlp import (
    ObjectNeRFConfig,
    init_object_nerf,
    scene_forward,
    instance_forward,
)
from .code_library import init_code_library, lookup_codes

__all__ = [
    "freq_encode",
    "freq_encode_channels",
    "ObjectNeRFConfig",
    "init_object_nerf",
    "scene_forward",
    "instance_forward",
    "init_code_library",
    "lookup_codes",
]
