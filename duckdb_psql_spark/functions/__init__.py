from .shims import apply_shims

__all__ = ["apply_shims"]
