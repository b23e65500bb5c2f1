from . import coords, lines, probability, sphere  # noqa: F401
