"""Import-time stand-in for visdom (parity harness only)."""


class Visdom:
    def __init__(self, *a, **k):
        raise NotImplementedError("visdom shim: no server in this environment")
