from .renderer import RenderSettings, render_rays

__all__ = ["RenderSettings", "render_rays"]
