"""Minimal stand-in for `beartype` so the reference package imports in this offline
test environment. Runtime type-checking is simply disabled."""


class BeartypeConf:
    def __init__(self, *args, **kwargs):
        pass


def beartype(func=None, **kwargs):
    if func is None:
        return lambda f: f
    return func
