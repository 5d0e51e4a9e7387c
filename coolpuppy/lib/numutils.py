from coolpuppy_tpu.lib.numutils import *  # noqa: F401,F403
