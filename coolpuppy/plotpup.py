"""Reference module alias: ``coolpuppy.plotpup`` -> coolpuppy_tpu.plotting."""

from coolpuppy_tpu.plotting import *  # noqa: F401,F403
from coolpuppy_tpu.plotting import plot, plot_stripes  # noqa: F401
