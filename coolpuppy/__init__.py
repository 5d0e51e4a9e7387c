"""Drop-in import-compatibility shim for the original ``coolpuppy``
package: reference users' scripts and the reference's own example
notebooks import ``from coolpuppy import coolpup, plotpup`` and
``from coolpuppy.lib import numutils, puputils, io`` (reference
docs/source/Examples/*.ipynb) — this thin package maps that surface onto
coolpuppy_tpu. Do not install alongside the original coolpuppy."""

from coolpuppy_tpu._version import __version__  # noqa: F401
from coolpuppy_tpu import (  # noqa: F401
    CoordCreator,
    PileUpper,
    pileup,
)
