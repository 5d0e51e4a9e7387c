from .mesh import (  # noqa: F401
    make_mesh,
    make_sharded_pileup_step,
    sharded_pileup_demo_inputs,
)
