from .ray_utils import get_ray_directions, get_rays, get_ndc_rays
from .geo_utils import (
    ray_aabb_intersect,
    average_poses,
    center_poses,
    center_pose_from_avg,
    observe_angle_distance,
)

# Dataset registry — same names as the reference (datasets/__init__.py:3-6).
dataset_dict = {}


def register_dataset(name):
    def deco(cls):
        dataset_dict[name] = cls
        return cls

    return deco


from .generic_dataset import GenericDataset  # noqa: E402  (registers itself)
from .synthetic import SyntheticDataset  # noqa: E402

__all__ = [
    "get_ray_directions",
    "get_rays",
    "get_ndc_rays",
    "ray_aabb_intersect",
    "average_poses",
    "center_poses",
    "center_pose_from_avg",
    "observe_angle_distance",
    "dataset_dict",
    "register_dataset",
    "GenericDataset",
    "SyntheticDataset",
]
