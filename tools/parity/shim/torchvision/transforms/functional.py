def _unavailable(*a, **k):
    raise NotImplementedError("torchvision shim: functional transforms are not implemented")


def __getattr__(name):
    return _unavailable
