from .spec import Flag, FRONT, BACK, PREFIX, SUFFIX  # noqa: F401
