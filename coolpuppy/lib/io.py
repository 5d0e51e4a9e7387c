from coolpuppy_tpu.io.clpy import (  # noqa: F401
    load_pileup_df,
    load_pileup_df_list,
    save_pileup_df,
)
from coolpuppy_tpu.io.txt import (  # noqa: F401
    load_array_with_header,
    save_array_with_header,
)
from coolpuppy_tpu.io.bedio import is_gz_file, sniff_for_header  # noqa: F401
