"""Import-time placeholder; the parity harness never runs these transforms."""

from . import functional  # noqa: F401


class _Unavailable:
    """Constructible (modules build transforms at import time, e.g.
    keep_track pytracking/features/deep.py:10) but not callable — the
    parity harness never applies them."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        raise NotImplementedError("torchvision shim: transforms are not implemented")


Compose = ToTensor = Normalize = Resize = CenterCrop = _Unavailable
