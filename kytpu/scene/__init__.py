from kytpu.scene.scene import Scene, Hit, intersect, occluded  # noqa: F401
from kytpu.scene import builders, shapes, texture  # noqa: F401
