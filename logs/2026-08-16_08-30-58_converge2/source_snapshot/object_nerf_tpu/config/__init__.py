from .config import Config, load_config, merge_cli

__all__ = ["Config", "load_config", "merge_cli"]
