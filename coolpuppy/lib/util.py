from coolpuppy_tpu.io.bedio import validate_csv  # noqa: F401
