from . import livox

__all__ = ["livox"]
