def _unavailable(*a, **k):
    raise NotImplementedError("pycocotools shim")


def __getattr__(name):
    return _unavailable
