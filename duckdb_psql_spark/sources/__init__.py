from .resolver import SourceResolver

__all__ = ["SourceResolver"]
