def beartype_this_package(*args, **kwargs):
    pass
