"""coolpuppy-tpu: TPU-native sparse pile-up (APA) engine for Hi-C data.

Same capabilities as open2c/coolpuppy (reference), re-architected for
JAX/XLA/Pallas on TPU. See DESIGN.md for the architecture.
"""

def _tune_allocator():
    """Keep large numpy buffers on the reusable glibc heap.

    By default glibc mmap()s allocations over ~128 KB and munmap()s them
    on free, so every large temporary re-pays first-touch page faults —
    ~50 us apiece on virtualized hosts, which made a fresh 180 MB pixel
    read cost ~0.8 s and a 245 MB window stack ~3 s (round-5 profiles).
    Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD keeps those buffers on the
    heap where freed blocks are reused already-faulted; memory stays at
    the high-water mark, which the streaming engine bounds by design."""
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_allocator()

from ._version import __version__  # noqa: F401,E402
from .coords import CoordCreator, assign_groups, bin_distance_intervals  # noqa: F401
from .engine import PileUpper, pileup  # noqa: F401
from .io import Cooler, write_cool  # noqa: F401
