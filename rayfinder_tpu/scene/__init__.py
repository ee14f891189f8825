from .texture import Texture
from .gltf import GltfMesh, GltfScene, load_gltf
from .flatten import FlattenedScene

__all__ = ["Texture", "GltfMesh", "GltfScene", "load_gltf", "FlattenedScene"]
