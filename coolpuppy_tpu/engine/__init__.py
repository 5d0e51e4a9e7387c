from .pileup import PileUpper, pileup  # noqa: F401
