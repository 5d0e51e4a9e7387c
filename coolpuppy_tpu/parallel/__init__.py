from .mesh import (  # noqa: F401
    make_engine_sharded_rescale_step,
    make_engine_sharded_step,
    make_loci_mesh,
    make_mesh,
    make_sharded_pileup_step,
    sharded_pileup_demo_inputs,
)
from .rowshard import (  # noqa: F401
    build_row_partition,
    make_row_sharded_step,
    route_snips,
)
from .distributed import (  # noqa: F401
    init_distributed,
    local_region_pairs,
    allreduce_region_maps,
)
