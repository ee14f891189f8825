from .ptformat import PtScene, read_pt, write_pt

__all__ = ["PtScene", "read_pt", "write_pt"]
