from .train_helper import visualize_depth, visualize_val_image

__all__ = ["visualize_depth", "visualize_val_image"]
