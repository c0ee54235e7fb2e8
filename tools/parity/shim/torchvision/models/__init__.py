from . import resnet  # noqa: F401
from .resnet import resnet18, resnet50  # noqa: F401
