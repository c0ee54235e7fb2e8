_model_entrypoints = {}


def register_model(fn):
    _model_entrypoints[fn.__name__] = fn
    return fn


def model_entrypoint(name):
    return _model_entrypoints[name]


def is_model(name):
    return name in _model_entrypoints
