"""lvis stand-in (parity harness only)."""


class LVIS:
    def __init__(self, *a, **k):
        raise NotImplementedError("lvis shim")
