from .build import Bvh, build_bvh, reorder_attributes

__all__ = ["Bvh", "build_bvh", "reorder_attributes"]
