from . import checks, scale

__all__ = ["checks", "scale"]
