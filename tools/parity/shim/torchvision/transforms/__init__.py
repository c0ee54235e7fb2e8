"""Import-time placeholder; the parity harness never runs these transforms."""

from . import functional  # noqa: F401


class _Unavailable:
    def __init__(self, *a, **k):
        raise NotImplementedError("torchvision shim: transforms are not implemented")


Compose = ToTensor = Normalize = Resize = CenterCrop = _Unavailable
