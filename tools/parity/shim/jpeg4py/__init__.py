"""Import-time stand-in for jpeg4py (parity harness only; never executed —
the reference's image loaders are not exercised by model parity checks)."""


class JPEGRuntimeError(RuntimeError):
    pass


class JPEG:
    def __init__(self, *a, **k):
        raise NotImplementedError("jpeg4py shim: decoding not available")
