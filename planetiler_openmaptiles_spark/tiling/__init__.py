from . import cells, explode, postprocess  # noqa: F401
