from . import io, numutils, puputils, util  # noqa: F401
