from coolpuppy_tpu.lib.puputils import *  # noqa: F401,F403
from coolpuppy_tpu.lib.puputils import _add_snip  # noqa: F401
