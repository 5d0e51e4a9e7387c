"""Optional C++ acceleration for host-side ingest (COO→tile scatter, pair
enumeration). Falls back to numpy when the extension isn't built; build with
`python -m coolpuppy_tpu.native.build`."""

try:
    from ._ingest_wrapper import tile_scatter  # noqa: F401
except Exception:  # pragma: no cover
    tile_scatter = None
