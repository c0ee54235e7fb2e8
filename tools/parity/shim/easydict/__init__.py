"""Minimal stand-in for the `easydict` package (not installed in this env).

Only used by tools/parity to import the reference's config modules; provides
dict-with-attribute-access semantics compatible with easydict.EasyDict as the
reference configs use it (assignment recursion included).
"""


class EasyDict(dict):
    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        d = dict(d)
        d.update(kwargs)
        for k, v in d.items():
            setattr(self, k, v)

    def __setattr__(self, name, value):
        if isinstance(value, dict) and not isinstance(value, EasyDict):
            value = EasyDict(value)
        elif isinstance(value, (list, tuple)):
            value = type(value)(
                EasyDict(x) if isinstance(x, dict) and not isinstance(x, EasyDict) else x
                for x in value
            )
        super().__setattr__(name, value)
        super().__setitem__(name, value)

    __setitem__ = __setattr__

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def update(self, other=None, **kwargs):
        d = dict(other or {})
        d.update(kwargs)
        for k, v in d.items():
            setattr(self, k, v)

    def pop(self, k, *args):
        if hasattr(self, k):
            object.__delattr__(self, k)
        return super().pop(k, *args)
