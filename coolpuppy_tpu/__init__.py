"""coolpuppy-tpu: TPU-native sparse pile-up (APA) engine for Hi-C data.

Same capabilities as open2c/coolpuppy (reference), re-architected for
JAX/XLA/Pallas on TPU. See DESIGN.md for the architecture.
"""

from ._version import __version__  # noqa: F401
from .coords import CoordCreator, assign_groups, bin_distance_intervals  # noqa: F401
from .engine import PileUpper, pileup  # noqa: F401
from .io import Cooler, write_cool  # noqa: F401
