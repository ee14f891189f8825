from .scene import DeviceScene
from .camera import Camera, create_camera, generate_camera_ray

__all__ = ["DeviceScene", "Camera", "create_camera", "generate_camera_ray"]
