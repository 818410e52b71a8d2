from .bbox import BBoxRayHelper, boxes_to_arrays, check_in_any_boxes_np
from .editable_renderer import EditableRenderer, read_testing_config

__all__ = [
    "BBoxRayHelper",
    "boxes_to_arrays",
    "check_in_any_boxes_np",
    "EditableRenderer",
    "read_testing_config",
]
