"""visdom.server stand-in (parity harness only)."""


def download_scripts(*a, **k):
    pass
