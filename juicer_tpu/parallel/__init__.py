"""Multi-chip / multi-host scale-out utilities."""

from .mesh import make_mesh, BatchDecoder

__all__ = ["make_mesh", "BatchDecoder"]
